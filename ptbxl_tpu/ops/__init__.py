from ptbxl_tpu.ops.preprocess import zscore_per_lead_batch  # noqa: F401
