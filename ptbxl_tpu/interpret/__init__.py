from ptbxl_tpu.interpret.grad_cam import (  # noqa: F401
    GradCAM,
    demo_importance,
    linear_interpolate_1d,
)
