from ptbxl_tpu.analysis.merge import merge_prediction_frames  # noqa: F401
