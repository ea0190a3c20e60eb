"""Model construction + variable initialization helpers for the CLI scripts."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ptbxl_tpu.models.ecg_cnn import ECGCNN
from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal


def dtype_from_config(name) -> jnp.dtype:
    """Map the ``train.dtype`` config string to a jnp dtype.

    'bfloat16' selects the bf16-activation training/inference configuration
    (f32 parameters and optimizer state); its convergence is gated by
    tests/test_learning.py[bf16].
    """
    table = {
        "float32": jnp.float32, "f32": jnp.float32,
        "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    }
    key = str(name).lower()
    if key not in table:
        raise ValueError(f"train.dtype must be one of {sorted(table)}, got {name!r}")
    return table[key]


def build_ecgcnn(
    in_leads: int = 12,
    feat_dim: int = 256,
    num_labels: int = 5,
    seed: int = 42,
    precision: Optional[str] = "highest",
    dtype: jnp.dtype = jnp.float32,
    torch_init: bool = False,
) -> Tuple[ECGCNN, Dict]:
    model = ECGCNN(
        feat_dim=feat_dim, num_labels=num_labels, in_leads=in_leads,
        precision=precision, dtype=dtype, torch_init=torch_init,
    )
    # init length is irrelevant to parameter shapes (conv is length-invariant)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 64, in_leads)))
    return model, variables


def build_multimodal(
    in_leads: int = 12,
    ecg_feat_dim: int = 256,
    demo_hidden_dim: int = 64,
    num_labels: int = 5,
    seed: int = 42,
    precision: Optional[str] = "highest",
    dtype: jnp.dtype = jnp.float32,
    torch_init: bool = False,
) -> Tuple[ECGMultimodal, Dict]:
    model = ECGMultimodal(
        feat_dim=ecg_feat_dim,
        demo_hidden_dim=demo_hidden_dim,
        num_labels=num_labels,
        in_leads=in_leads,
        precision=precision,
        dtype=dtype,
        torch_init=torch_init,
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, in_leads)), jnp.zeros((1, 5))
    )
    return model, variables


def load_ecgcnn(
    ckpt_path: str,
    num_labels: int = 5,
    feat_dim: int = 256,
    in_leads: int = 12,
    strict: bool = True,
) -> Tuple[ECGCNN, Dict, Optional[list]]:
    """Build an ECGCNN and load a checkpoint (.npz native or reference .pth).

    ``strict=False`` mirrors the reference's lenient demo/Grad-CAM loads
    (scripts/00:118, 11:75): missing entries keep their random init.
    """
    from ptbxl_tpu.models.params_io import load_checkpoint

    model, variables = build_ecgcnn(in_leads, feat_dim, num_labels)
    loaded, classes = load_checkpoint(ckpt_path, arch="ecgcnn")
    variables = _merge_variables(variables, loaded, strict=strict)
    return model, variables, classes


def load_multimodal(
    ckpt_path: str,
    num_labels: int = 5,
    ecg_feat_dim: int = 256,
    demo_hidden_dim: int = 64,
    in_leads: int = 12,
    strict: bool = True,
) -> Tuple[ECGMultimodal, Dict, Optional[list]]:
    from ptbxl_tpu.models.params_io import load_checkpoint

    model, variables = build_multimodal(in_leads, ecg_feat_dim, demo_hidden_dim, num_labels)
    loaded, classes = load_checkpoint(ckpt_path, arch="multimodal")
    variables = _merge_variables(variables, loaded, strict=strict)
    return model, variables, classes


def _merge_variables(init: Dict, loaded: Dict, strict: bool) -> Dict:
    """Overlay loaded collections onto the initialized structure.

    strict: shapes/keys must match the initialized structure exactly.
    lenient: take matching entries, keep init for the rest (strict=False torch).
    """
    import copy

    if strict:
        # validate structural equality, then take loaded values as-is
        init_flat = jax.tree_util.tree_leaves_with_path(init)
        loaded_flat = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(loaded)
        )
        for path, leaf in init_flat:
            key = jax.tree_util.keystr(path)
            if key not in loaded_flat:
                raise KeyError(f"Checkpoint missing entry {key}")
            if tuple(loaded_flat[key].shape) != tuple(leaf.shape):
                raise ValueError(
                    f"Shape mismatch at {key}: ckpt {loaded_flat[key].shape} vs model {leaf.shape}"
                )
        return loaded

    out = copy.deepcopy(jax.device_get(init))

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                overlay(dst[k], v)
            elif k in dst and tuple(getattr(dst[k], "shape", ())) == tuple(v.shape):
                dst[k] = v
    for coll in loaded:
        if coll in out:
            overlay(out[coll], loaded[coll])
    return out


def merge_backbone(variables: Dict, backbone_vars: Dict) -> Dict:
    """Warm-start the multimodal ECG encoder from a baseline checkpoint.

    Mirrors the reference's strict=False load into model.ecg_backbone
    (scripts/04:149-156): matching conv-block/proj entries replace the random
    init; everything else (demo encoder, film, head) is untouched.
    """
    import copy

    out = copy.deepcopy(jax.device_get(variables))
    for coll in ("params", "batch_stats"):
        if coll not in backbone_vars:
            continue
        dst = out[coll]["ecg_backbone"]
        for k, v in backbone_vars[coll].items():
            if k in dst:
                _check_shapes(dst[k], v, f"{coll}/ecg_backbone/{k}")
                dst[k] = v
    return out


def _check_shapes(dst, src, path: str):
    """Recursive shape check for a warm-start overlay.

    torch's strict=False load still errors on size mismatches
    (reference scripts/04:149-156); overlaying a wrong-feat_dim encoder must
    fail here, not as an opaque shape error inside model.apply."""
    if isinstance(dst, dict):
        for k in dst.keys() & src.keys():
            _check_shapes(dst[k], src[k], f"{path}/{k}")
        return
    ds = tuple(getattr(dst, "shape", ()))
    ss = tuple(getattr(src, "shape", ()))
    if ds != ss:
        raise ValueError(
            f"warm-start shape mismatch at {path}: model {ds} vs checkpoint {ss}"
        )
