"""JAX model zoo.

Replaces the reference's external model binaries and lazy PyTorch stacks
(realesrgan-ncnn-vulkan, basicsr RRDBNet, rife-ncnn-vulkan, Restormer/
NAFNet, GFPGAN, LaMA — SURVEY.md §2.A) with in-process functional JAX
implementations: pure ``apply(params, x)`` forwards over NHWC arrays,
parameter pytrees whose structure mirrors the official torch state_dict
names so released weights port mechanically (models/torch_port.py).
"""

from framewright_tpu.models.registry import (  # noqa: F401
    MODEL_SPECS,
    get_model,
    init_model,
)
