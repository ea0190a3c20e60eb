from ptbxl_tpu.data.datasets import (  # noqa: F401
    PTBXLAFDataset,
    PTBXLDataset,
    PTBXLECGMultimodalDataset,
)
from ptbxl_tpu.data.demo_vector import build_demo_vector  # noqa: F401
