from ptbxl_tpu.models.ecg_cnn import ConvBlock, ECGCNN  # noqa: F401
from ptbxl_tpu.models.ecg_multimodal import (  # noqa: F401
    DemoEncoder,
    ECGBackbone,
    ECGMultimodal,
)
