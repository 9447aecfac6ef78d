"""framewright-tpu: TPU-native video restoration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of FrameWright
(reference: KingOfTheAce2/video-restoration-pipeline-framewright). The
reference orchestrates external GPU binaries over PNG frame directories;
this framework keeps frames resident in device HBM and runs restoration
models (Real-ESRGAN RRDB, RIFE IFNet, NAFNet/Restormer temporal denoise,
GFPGAN-class face restore, LaMA-class inpainting) as jit-compiled JAX
forwards with Pallas kernels for the hot ops, sharded over a TPU mesh
via ``jax.sharding`` for scene-chunked data parallelism.

Public API mirrors the reference's shape (see SURVEY.md):

    from framewright_tpu import Config, VideoRestorer
    restorer = VideoRestorer(Config(scale_factor=2))
    restorer.restore_video("input.y4m")
"""

__version__ = "0.1.0"

from framewright_tpu.config import Config, PRESETS, get_preset  # noqa: F401
from framewright_tpu.errors import (  # noqa: F401
    FramewrightError,
    TransientError,
    FatalError,
    classify_error,
)

__all__ = [
    "Config",
    "PRESETS",
    "get_preset",
    "FramewrightError",
    "TransientError",
    "FatalError",
    "classify_error",
    "VideoRestorer",
    "__version__",
]


def __getattr__(name):
    # Lazy import: VideoRestorer pulls in jax; keep `import framewright_tpu`
    # cheap for config-only consumers (CLI arg parsing, dashboards).
    if name == "VideoRestorer":
        from framewright_tpu.restorer import VideoRestorer

        return VideoRestorer
    raise AttributeError(f"module 'framewright_tpu' has no attribute {name!r}")
