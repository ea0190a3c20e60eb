"""Model construction + variable initialization helpers for the CLI scripts."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ptbxl_tpu.models.ecg_cnn import ECGCNN
from ptbxl_tpu.models.ecg_multimodal import ECGMultimodal


def build_ecgcnn(
    in_leads: int = 12,
    feat_dim: int = 256,
    num_labels: int = 5,
    seed: int = 42,
    precision: Optional[str] = "highest",
) -> Tuple[ECGCNN, Dict]:
    model = ECGCNN(
        feat_dim=feat_dim, num_labels=num_labels, in_leads=in_leads, precision=precision
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
) -> Tuple[ECGMultimodal, Dict]:
    model = ECGMultimodal(
        feat_dim=ecg_feat_dim,
        demo_hidden_dim=demo_hidden_dim,
        num_labels=num_labels,
        in_leads=in_leads,
        precision=precision,
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 64, in_leads)), jnp.zeros((1, 5))
    )
    return model, variables


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
                dst[k] = v
    return out
