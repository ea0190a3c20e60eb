"""Checkpoint I/O: reference-.pth conversion and the native .npz format.

The reference's wire format is ``torch.save({"model_state": state_dict,
"classes": classes}, path)`` (reference: scripts/03_train_ecg_baseline.py:167;
AF omits "classes", scripts/05:158), and loaders accept bare state-dicts too
(scripts/06:80).  This module provides:

* ``read_pth`` — load a torch-format checkpoint into numpy.  Uses torch when
  available; otherwise falls back to a pure-Python reader of torch's zip
  serialization format (data.pkl + raw little-endian storages).
* ``torch_to_flax_* / flax_to_torch_*`` — key/layout mapping between the
  reference's state-dict names and our Flax variable collections.  Conv
  weights transpose (out,in,k) <-> (k,in,out); Dense (out,in) <-> (in,out);
  BatchNorm running stats map to the ``batch_stats`` collection.
* ``export_pth`` — write a byte-compatible reference checkpoint (requires
  torch; includes num_batches_tracked so strict torch loads succeed).
* ``save_npz / load_npz`` — the framework-native single-file format
  (flattened variable paths + class names), no torch required.
"""

from __future__ import annotations

import io
import os
import pickle
import zipfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Pure-python torch zip-format reader
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    def __init__(self, dtype: np.dtype, data: bytes):
        self.array = np.frombuffer(data, dtype=dtype)


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride, *unused):
    arr = storage.array
    itemsize = arr.itemsize
    if not size:
        return arr[storage_offset].copy()
    strides = tuple(s * itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides
    )
    return np.ascontiguousarray(view)


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def persistent_load(self, saved_id):
        kind = saved_id[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unsupported persistent id kind: {kind}")
        storage_type, key, _location, _numel = saved_id[1:5]
        if not isinstance(storage_type, np.dtype):
            # unknown storage class (e.g. BFloat16Storage): reinterpreting
            # its raw bytes as f32 would load garbage weights silently
            raise pickle.UnpicklingError(
                f"unsupported torch storage type {storage_type!r}; install "
                "torch to read this checkpoint"
            )
        data = self._zf.read(f"{self._prefix}/data/{key}")
        return _StorageRef(storage_type, data)

    def find_class(self, module, name):
        if name in _STORAGE_DTYPES:
            return np.dtype(_STORAGE_DTYPES[name])
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return _rebuild_tensor_v2
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        if module.startswith("torch"):
            # Benign torch symbols that may appear in checkpoints (dtypes etc.)
            return lambda *a, **k: None
        return super().find_class(module, name)


def _read_pth_pure_python(path: str) -> Any:
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path} is not a torch zip checkpoint")
        prefix = pkl_names[0][: -len("/data.pkl")]
        with zf.open(pkl_names[0]) as f:
            return _TorchUnpickler(io.BufferedReader(f), zf, prefix).load()


def read_pth(path: str) -> Dict[str, Any]:
    """Load a reference checkpoint into ``{"model_state": {k: np.ndarray}, ...}``.

    Accepts both the wrapped dict and a bare state-dict (reference loaders do
    the same, scripts/06:80).
    """
    try:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)

        def to_np(v):
            return v.detach().cpu().numpy() if hasattr(v, "detach") else v

    except ImportError:  # pragma: no cover - torch present in dev env
        obj = _read_pth_pure_python(path)

        def to_np(v):
            return v

    if isinstance(obj, dict) and "model_state" in obj:
        state = {k: np.asarray(to_np(v)) for k, v in obj["model_state"].items()}
        out: Dict[str, Any] = {"model_state": state}
        if "classes" in obj:
            out["classes"] = [str(c) for c in obj["classes"]]
        return out
    # bare state dict
    state = {k: np.asarray(to_np(v)) for k, v in obj.items()}
    return {"model_state": state}


# ---------------------------------------------------------------------------
# torch <-> flax mapping
# ---------------------------------------------------------------------------


def _conv_w_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # (out,in,k) -> (k,in,out)


def _conv_w_to_torch(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (2, 1, 0))


def _blocks_from_torch(state: Dict[str, np.ndarray], prefix: str, n_blocks: int = 4):
    """Map ``{prefix}{i}.net.{0,1}.*`` conv-block keys to flax collections."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_blocks):
        b = f"{prefix}{i}.net."
        params[f"blocks_{i}"] = {
            "conv": {
                "kernel": _conv_w_to_flax(state[b + "0.weight"]).astype(np.float32),
                "bias": state[b + "0.bias"].astype(np.float32),
            },
            "bn": {
                "scale": state[b + "1.weight"].astype(np.float32),
                "bias": state[b + "1.bias"].astype(np.float32),
            },
        }
        stats[f"blocks_{i}"] = {
            "bn": {
                "mean": state[b + "1.running_mean"].astype(np.float32),
                "var": state[b + "1.running_var"].astype(np.float32),
            }
        }
    return params, stats


def _blocks_to_torch(params: Dict, stats: Dict, prefix: str, out: Dict[str, np.ndarray]):
    i = 0
    while f"blocks_{i}" in params:
        b = f"{prefix}{i}.net."
        p, s = params[f"blocks_{i}"], stats[f"blocks_{i}"]
        out[b + "0.weight"] = _conv_w_to_torch(np.asarray(p["conv"]["kernel"]))
        out[b + "0.bias"] = np.asarray(p["conv"]["bias"])
        out[b + "1.weight"] = np.asarray(p["bn"]["scale"])
        out[b + "1.bias"] = np.asarray(p["bn"]["bias"])
        out[b + "1.running_mean"] = np.asarray(s["bn"]["mean"])
        out[b + "1.running_var"] = np.asarray(s["bn"]["var"])
        out[b + "1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
        i += 1


def _dense_from_torch(state: Dict[str, np.ndarray], name: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": state[name + ".weight"].T.astype(np.float32),
        "bias": state[name + ".bias"].astype(np.float32),
    }


def _dense_to_torch(p: Dict, name: str, out: Dict[str, np.ndarray]):
    out[name + ".weight"] = np.asarray(p["kernel"]).T
    out[name + ".bias"] = np.asarray(p["bias"])


def torch_to_flax_ecgcnn(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ECGCNN state-dict -> {'params', 'batch_stats'} variables."""
    params, stats = _blocks_from_torch(state, "backbone.")
    params["proj"] = _dense_from_torch(state, "proj")
    params["head"] = _dense_from_torch(state, "head")
    return {"params": params, "batch_stats": stats}


def flax_to_torch_ecgcnn(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _blocks_to_torch(variables["params"], variables["batch_stats"], "backbone.", out)
    _dense_to_torch(variables["params"]["proj"], "proj", out)
    _dense_to_torch(variables["params"]["head"], "head", out)
    return out


def torch_to_flax_backbone(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ECGCNN-or-ECGBackbone state-dict -> variables for an ECGBackbone.

    Used by the multimodal warm start, which loads a baseline encoder with
    strict=False (reference: scripts/04:149-156): matching keys (conv blocks +
    proj) are taken, the classifier head is dropped.
    """
    params, stats = _blocks_from_torch(state, "backbone.")
    if "proj.weight" in state:
        params["proj"] = _dense_from_torch(state, "proj")
    return {"params": params, "batch_stats": stats}


def torch_to_flax_multimodal(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ECGMultimodal state-dict -> {'params', 'batch_stats'}."""
    bb_params, bb_stats = _blocks_from_torch(state, "ecg_backbone.backbone.")
    bb_params["proj"] = _dense_from_torch(state, "ecg_backbone.proj")
    params = {
        "ecg_backbone": bb_params,
        "demo_encoder": {
            "fc1": _dense_from_torch(state, "demo_encoder.mlp.0"),
            "fc2": _dense_from_torch(state, "demo_encoder.mlp.2"),
        },
        "film_gen": _dense_from_torch(state, "film_gen"),
        "head": _dense_from_torch(state, "head"),
    }
    return {"params": params, "batch_stats": {"ecg_backbone": bb_stats}}


def flax_to_torch_multimodal(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    p, s = variables["params"], variables["batch_stats"]
    _blocks_to_torch(p["ecg_backbone"], s["ecg_backbone"], "ecg_backbone.backbone.", out)
    _dense_to_torch(p["ecg_backbone"]["proj"], "ecg_backbone.proj", out)
    _dense_to_torch(p["demo_encoder"]["fc1"], "demo_encoder.mlp.0", out)
    _dense_to_torch(p["demo_encoder"]["fc2"], "demo_encoder.mlp.2", out)
    _dense_to_torch(p["film_gen"], "film_gen", out)
    _dense_to_torch(p["head"], "head", out)
    return out


# ---------------------------------------------------------------------------
# Loading checkpoints into model variables (arch-dispatched)
# ---------------------------------------------------------------------------

_FROM_TORCH = {
    "ecgcnn": torch_to_flax_ecgcnn,
    "multimodal": torch_to_flax_multimodal,
    "backbone": torch_to_flax_backbone,
}
_TO_TORCH = {
    "ecgcnn": flax_to_torch_ecgcnn,
    "multimodal": flax_to_torch_multimodal,
}


def load_checkpoint(path: str, arch: str) -> Tuple[Dict[str, Any], Optional[List[str]]]:
    """Load .pth (reference format) or .npz (native) -> (variables, classes)."""
    if path.endswith(".npz"):
        return load_npz(path)
    ck = read_pth(path)
    variables = _FROM_TORCH[arch](ck["model_state"])
    return variables, ck.get("classes")


def export_pth(
    path: str,
    variables: Dict[str, Any],
    arch: str,
    classes: Optional[List[str]] = None,
) -> None:
    """Write a reference-compatible .pth checkpoint (requires torch)."""
    import torch

    state = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in _TO_TORCH[arch](variables).items()}
    payload: Dict[str, Any] = {"model_state": state}
    if classes is not None:
        payload["classes"] = list(classes)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(payload, path)


# ---------------------------------------------------------------------------
# Native single-file format
# ---------------------------------------------------------------------------


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(
    path: str,
    variables: Dict[str, Any],
    classes: Optional[List[str]] = None,
) -> None:
    flat = _flatten(variables)
    if classes is not None:
        flat["__classes__"] = np.array(classes)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Dict[str, Any], Optional[List[str]]]:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    classes = None
    if "__classes__" in flat:
        classes = [str(c) for c in flat.pop("__classes__")]
    return _unflatten(flat), classes
