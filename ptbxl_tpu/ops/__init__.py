from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch  # noqa: F401
from ptbxl_tpu.ops.quant import (  # noqa: F401
    load_qparams,
    quantize_model,
    save_qparams,
)
