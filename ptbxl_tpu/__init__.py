"""ptbxl_tpu — TPU-native ECG classification framework.

A ground-up JAX/Flax/Optax/Pallas rebuild of the capabilities of the PyTorch
reference ``cyu0330/ptbxl-multimodal`` (see /root/reference):

* 5-superclass multi-label ECG baseline CNN   (reference: src/models/ecg_cnn.py)
* multimodal ECG + demographics FiLM model    (reference: src/models/ecg_multimodal.py)
* binary atrial-fibrillation classifier       (reference: scripts/05_train_af_binary.py)
* Grad-CAM interpretability via jax.vjp       (reference: src/interpretability/grad_cam_1d.py)
* PTB-XL WFDB ingestion + cached manifest     (reference: src/datasets/*.py)
* data-parallel training over a TPU mesh      (new; reference is single-device)

Layout convention: device arrays are channels-last ``[B, T, C]`` for TPU lane
efficiency; the host-facing API keeps the reference's ``[12, T]`` convention and
transposes at the boundary.
"""

__version__ = "0.1.0"

DEFAULT_CLASSES = ["MI", "STTC", "HYP", "CD", "NORM"]
