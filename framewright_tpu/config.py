"""Configuration system for framewright-tpu.

Capability parity with the reference's ``config.py:256-1363`` (Config
dataclass with ~150 flags in feature groups, validation in
``__post_init__``, derived directories, ``to_dict``/``from_dict``,
``get_hash`` for checkpoint identity, named PRESETS, YAML config files,
``FRAMEWRIGHT_*`` env overrides) — with GPU/VRAM-era flags replaced by
TPU-native ones (device mesh shape, HBM budget, bf16/int8 compute
dtypes, XLA compilation cache) while keeping the same user-facing verbs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

from framewright_tpu.errors import ConfigError

# ---------------------------------------------------------------------------
# Presets (analog of reference config.py:11-140)
# ---------------------------------------------------------------------------

PRESETS: Dict[str, Dict[str, Any]] = {
    "fast": {
        "description": "Quick processing - compact model, bf16, minimal "
                       "extras (FW_fastvgg_x2: trained-in-repo packaged "
                       "weights, 22 fps/chip — works with no downloads)",
        "scale_factor": 2,
        "sr_model": "FW_fastvgg_x2",
        "compute_dtype": "bfloat16",
        "denoise": False,
        "face_restore": False,
        "interpolation": False,
        "temporal_consistency": False,
        "crf": 23,
    },
    "quality": {
        "description": "Balanced quality/speed - RRDB SR + temporal consistency",
        "scale_factor": 2,
        "sr_model": "RealESRGAN_x2plus",
        "compute_dtype": "bfloat16",
        "denoise": True,
        "denoise_model": "auto",
        "face_restore": False,
        "interpolation": False,
        "temporal_consistency": True,
        "crf": 18,
    },
    "archive": {
        "description": "Archival restoration - full restoration stack, fp32 accumulate",
        "scale_factor": 4,
        "sr_model": "RealESRGAN_x4plus",
        "compute_dtype": "bfloat16",
        "denoise": True,
        "denoise_model": "auto",
        "face_restore": True,
        "interpolation": True,
        "target_fps": 0.0,
        "deduplicate": True,
        "temporal_consistency": True,
        "defect_repair": True,
        "crf": 14,
    },
    "ultimate": {
        "description": "Everything on - slowest, best possible output",
        "scale_factor": 4,
        "sr_model": "RealESRGAN_x4plus",
        "compute_dtype": "bfloat16",
        "denoise": True,
        "denoise_model": "auto",
        "face_restore": True,
        "interpolation": True,
        "deduplicate": True,
        "temporal_consistency": True,
        "defect_repair": True,
        "colorize": False,
        "grain_preserve": True,
        "crf": 12,
        "validate_output": True,
    },
}


def get_preset(name: str) -> Dict[str, Any]:
    if name not in PRESETS:
        raise ConfigError(
            f"Unknown preset {name!r}. Available: {sorted(PRESETS)}"
        )
    return {k: v for k, v in PRESETS[name].items() if k != "description"}


_VALID_SR_MODELS = (
    "RealESRGAN_x4plus",
    "RealESRGAN_x4plus_anime_6B",
    "RealESRGAN_x2plus",
    "realesr-animevideov3",
    "realesr-general-x4v3",
    "BasicVSR",
    "TVSR_x4",
    "HAT_SRx4",
    "DiffusionSR_x4",
    "none",
)


def _sr_model_known(name: str) -> bool:
    if name in _VALID_SR_MODELS:
        return True
    try:  # custom models registered at runtime (plugins, tests)
        from framewright_tpu.models.registry import MODEL_SPECS

        return name in MODEL_SPECS
    except Exception:  # noqa: BLE001
        return False

_VALID_DTYPES = ("bfloat16", "float32", "int8")
_VALID_DENOISERS = ("auto", "nafnet", "restormer", "temporal", "bilateral",
                    "none")
_VALID_SHARDING = ("data", "spatial", "none", "auto")


# ---------------------------------------------------------------------------
# Config dataclass
# ---------------------------------------------------------------------------

@dataclass
class Config:
    """Pipeline configuration. Field groups mirror the reference's
    feature groups; defaults chosen for TPU v5e single-chip operation."""

    # --- I/O ---------------------------------------------------------------
    project_dir: Path = field(default_factory=lambda: Path("./framewright_project"))
    output_path: Optional[Path] = None
    output_format: str = "auto"          # auto|y4m|png|mp4|mkv (mp4/mkv need ffmpeg)
    keep_intermediates: bool = False
    png_compression: int = 1

    # --- Super-resolution ----------------------------------------------------
    scale_factor: int = 2                 # 1 disables SR
    sr_model: str = "RealESRGAN_x2plus"
    tile_size: int = 0                    # 0 = auto (HBM planner decides)
    tile_overlap: int = 8                 # halo pixels per tile edge
    batch_size: int = 0                   # frames per device step; 0 = auto
    outscale: float = 0.0                 # final resize factor; 0 = scale_factor
    # multi-model ensembling (reference processors/ensemble_sr.py): extra
    # models run alongside sr_model and outputs are combined per strategy
    sr_ensemble: str = ""                 # comma list of additional SR models
    ensemble_strategy: str = "weighted"   # weighted|median|max_sharpness

    # --- Compute / device ------------------------------------------------------
    compute_dtype: str = "bfloat16"       # model forward dtype
    accum_dtype: str = "float32"          # conv accumulation dtype
    device_platform: str = "auto"         # auto|tpu|cpu
    allow_cpu_fallback: bool = True
    hbm_budget_gb: float = 0.0            # 0 = autodetect
    hbm_utilization: float = 0.85         # fraction of HBM the planner may use
    xla_cache_dir: Optional[Path] = None  # persistent compilation cache

    # --- Parallelism (replaces reference multi-GPU flags) ----------------------
    mesh_shape: Tuple[int, ...] = ()      # () = all local devices on one axis
    sharding_strategy: str = "auto"       # data|spatial|none|auto
    scene_chunk_frames: int = 100         # frames per distributed chunk (ref config.py:502)
    chunk_overlap_frames: int = 4         # temporal halo for chunked stages
    multihost: bool = False

    # --- Denoise / temporal -----------------------------------------------------
    denoise: bool = False
    denoise_model: str = "nafnet"
    denoise_strength: float = 0.5
    temporal_window: int = 7              # 2r+1, r=3 (ref temporal_denoise.py:114)
    flow_model: str = "ifnet"             # ifnet | raft (alignment flow backend,
                                          # ref processors/raft_flow.py)
    temporal_consistency: bool = False
    temporal_model: str = "attention"     # attention (cross-frame) | ema
    qp_removal: bool = False              # codec deblocking/deringing
    qp_strength: float = 0.0              # 0 = auto from blockiness
    scene_threshold: float = 0.30         # scene-change detector sensitivity
    grain_preserve: bool = False
    grain_strength: float = 0.3
    grain_mode: str = "auto"              # auto|off|preserve|remove|match:
                                          # post-SR grain handling (auto =
                                          # match when grain_preserve else off)
    grain_target: float = 0.0             # match target level; 0 = measured
    scene_adaptive: bool = False          # per-scene content-aware strength
                                          # modulation (ref scene_intelligence
                                          # SceneAdaptiveProcessor:749)
    # long-form global consistency (anchors + drift correction,
    # engine/temporal.py; reference engine/temporal_consistency.py:993)
    long_form: str = "auto"               # auto|on|off
    long_form_threshold: int = 1500       # auto engages at >= this many frames
    anchor_interval: int = 50             # frames between global anchors
    long_form_strength: float = 0.5       # drift-correction blend

    # --- Deduplication / interpolation ----------------------------------------
    deduplicate: bool = False
    dedup_similarity: float = 0.98        # Hamming similarity gate (ref deduplication.py)
    dedup_hash_size: int = 8
    interpolation: bool = False
    target_fps: float = 0.0               # 0 = keep source fps (or 2x when interpolating)
    interpolation_model: str = "rife-v4.6"
    interpolation_passes: int = 1
    motion_blur_reduction: bool = False
    scene_change_skip: bool = True        # don't interpolate across cuts

    # --- Faces / inpainting / color --------------------------------------------
    face_restore: bool = False
    face_model: str = "gfpgan"            # gfpgan | codeformer | sr
    face_strength: float = 0.8
    face_fidelity: float = 0.5            # codeformer w: 0 quality..1 fidelity
    inpaint: bool = False
    inpaint_model: str = "lama"
    watermark_removal: bool = False
    watermark_auto_detect: bool = True
    watermark_regions: Tuple[Tuple[int, int, int, int], ...] = ()
                                          # explicit (x, y, w, h) masks
                                          # (ref watermark_mask_path analog)
    subtitle_removal: bool = False
    subtitle_region: str = "bottom"       # OCR band: bottom|top|full
    subtitle_ocr_engine: str = "auto"     # auto|tesseract|none (timing only)
    subtitle_languages: Tuple[str, ...] = ("eng",)
    colorize: bool = False
    colorize_model: str = "ddcolor"
    colorize_saturation: float = 0.5      # chroma strength (0-1)
    colorize_keyframe_interval: int = 24  # flow-propagation keyframe gap
    colorize_strength: float = 1.0        # chroma blend vs source

    # --- Diffusion SR (reference diffusion_steps/guidance) ----------------------
    diffusion_steps: int = 8              # DDIM sampling steps
    diffusion_strength: float = 0.35      # SDEdit noise level (t_start frac)

    # --- Guided SR (reference enhancement/guided_sr.py) -------------------------
    sr_prompt: str = ""                   # style prompt (controlled vocab)
    sr_style_preset: str = ""             # named preset (processors/guided.py)
    guidance_scale: float = 5.0           # classifier-free guidance weight
    reference_images_dir: Optional[Path] = None  # stills to match
    reference_strength: float = 0.5       # statistics-transfer blend

    # --- Auto-enhance (reference config.py enable_auto_enhance group) ---------
    auto_enhance: bool = False            # analyze content, toggle stages
    auto_detect_content: bool = True      # content-type detection during auto

    # --- Format / geometry --------------------------------------------------------
    deinterlace: str = "auto"             # auto|off|yadif|bwdif
    inverse_telecine: bool = False
    crop_letterbox: bool = False
    aspect_correction: bool = False
    stabilize: bool = False
    stabilize_smoothing: int = 15         # trajectory smoothing radius (frames)
    stabilize_crop: float = 0.95          # retained frame fraction (crop-zoom)
    stabilize_rotation: bool = True       # estimate roll as well as translation
    defect_repair: bool = False
    defect_scratch_sensitivity: float = 12.0   # column-scratch detector thresh
    defect_dust_sensitivity: float = 45.0      # dust/speck detector thresh
    fill_missing_frames: bool = False     # synthesize dropped frames (IFNet)
    gap_jump_ratio: float = 1.8           # motion-discontinuity gap detector
    hdr_output: str = "none"              # none|hdr10|hdr10plus|hlg
    hdr_peak_nits: float = 1000.0         # mastering peak for SDR->HDR expand
    hdr_highlight_boost: float = 0.6

    # --- VHS restoration (reference processors/vhs_*.py flag group) ------------
    vhs_restore: bool = False
    vhs_fix_tracking: bool = True
    vhs_fix_dropouts: bool = True
    vhs_fix_chroma: bool = True
    vhs_fix_dot_crawl: bool = True
    vhs_tracking_threshold: float = 30.0

    # --- Authenticity guard (reference enable_authenticity_guard) --------------
    max_enhancement_strength: float = 1.0  # <1 blends output toward the
                                           # plain upscale (era character)

    # --- Audio ----------------------------------------------------------------------
    process_audio: bool = True
    audio_denoise: bool = False
    audio_sync_correction: bool = False

    # --- Encoding --------------------------------------------------------------------
    codec: str = "libx265"
    crf: int = 18
    encode_preset: str = "medium"
    pixel_format: str = "yuv420p"

    # --- Checkpoint / resume ------------------------------------------------------------
    checkpoint_enabled: bool = True
    checkpoint_interval: int = 50         # frames between checkpoint saves
    resume: bool = True
    max_runtime_minutes: float = 0.0      # 0 = unlimited; else stop the
                                          # enhance loop gracefully at the
                                          # budget (checkpoint lets a rerun
                                          # resume — ref max_runtime_minutes)
    stage_max_retries: int = 1            # DAG stage retry count
                                          # (ref max_retries)

    # --- Validation / quality gates -----------------------------------------------------
    validate_output: bool = True
    min_ssim: float = 0.85                # ref config.py:327
    min_psnr: float = 25.0                # ref config.py:328
    min_vmaf: float = 0.0                 # perceptual gate (vmaf_proxy);
                                          # 0 = off (ref quality/vmaf.py)
    continue_on_error: bool = True        # copy original frame on stage failure
    quality_report_format: str = "json"   # json|html|none (QA report file)

    # --- Misc -----------------------------------------------------------------------------
    verbose: bool = False
    dry_run: bool = False
    seed: int = 0
    preset: str = ""                      # name of preset this was derived from

    # Derived (set in __post_init__)
    frames_dir: Path = field(init=False, repr=False, default=None)  # type: ignore[assignment]
    work_dir: Path = field(init=False, repr=False, default=None)    # type: ignore[assignment]
    checkpoint_dir: Path = field(init=False, repr=False, default=None)  # type: ignore[assignment]

    # ------------------------------------------------------------------
    def __post_init__(self) -> None:
        self.project_dir = Path(self.project_dir)
        if self.output_path is not None:
            self.output_path = Path(self.output_path)
        if self.xla_cache_dir is not None:
            self.xla_cache_dir = Path(self.xla_cache_dir)
        if self.reference_images_dir is not None:
            self.reference_images_dir = Path(self.reference_images_dir)
        self.work_dir = self.project_dir / "work"
        self.frames_dir = self.work_dir / "frames"
        self.checkpoint_dir = self.project_dir / "checkpoints"
        self._validate()

    def _validate(self) -> None:
        if self.scale_factor not in (1, 2, 3, 4):
            raise ConfigError(f"scale_factor must be 1-4, got {self.scale_factor}")
        if not _sr_model_known(self.sr_model):
            raise ConfigError(
                f"Unknown sr_model {self.sr_model!r}; valid: {_VALID_SR_MODELS}"
            )
        if self.ensemble_strategy not in ("weighted", "median", "max_sharpness"):
            raise ConfigError(
                "ensemble_strategy must be weighted|median|max_sharpness")
        for name in self.ensemble_models():
            if not _sr_model_known(name):
                raise ConfigError(
                    f"Unknown ensemble model {name!r}; valid: {_VALID_SR_MODELS}")
        if self.compute_dtype not in _VALID_DTYPES:
            raise ConfigError(f"compute_dtype must be one of {_VALID_DTYPES}")
        if self.denoise_model not in _VALID_DENOISERS:
            raise ConfigError(f"denoise_model must be one of {_VALID_DENOISERS}")
        if self.flow_model not in ("ifnet", "raft"):
            raise ConfigError("flow_model must be ifnet|raft")
        if self.sharding_strategy not in _VALID_SHARDING:
            raise ConfigError(f"sharding_strategy must be one of {_VALID_SHARDING}")
        if not (0.0 < self.hbm_utilization <= 1.0):
            raise ConfigError("hbm_utilization must be in (0, 1]")
        if not (0.0 <= self.dedup_similarity <= 1.0):
            raise ConfigError("dedup_similarity must be in [0, 1]")
        if self.tile_size < 0 or self.tile_size % 8:
            if self.tile_size != 0:
                raise ConfigError("tile_size must be 0 (auto) or a positive multiple of 8")
        if self.tile_overlap < 0:
            raise ConfigError("tile_overlap must be >= 0")
        if self.temporal_window < 1 or self.temporal_window % 2 == 0:
            raise ConfigError("temporal_window must be an odd integer >= 1")
        if not (0 <= self.crf <= 51):
            raise ConfigError("crf must be in [0, 51]")
        if self.checkpoint_interval < 1:
            raise ConfigError("checkpoint_interval must be >= 1")
        if self.target_fps < 0:
            raise ConfigError("target_fps must be >= 0")
        if self.interpolation_passes not in (1, 2, 3):
            raise ConfigError("interpolation_passes must be 1-3")
        if self.mesh_shape and any(d < 1 for d in self.mesh_shape):
            raise ConfigError("mesh_shape entries must be >= 1")
        if self.long_form not in ("auto", "on", "off"):
            raise ConfigError("long_form must be auto|on|off")
        if self.temporal_model not in ("attention", "ema", "latent"):
            raise ConfigError("temporal_model must be attention|ema|latent")
        if not (0.0 < self.stabilize_crop <= 1.0):
            raise ConfigError("stabilize_crop must be in (0, 1]")
        if self.stabilize_smoothing < 1:
            raise ConfigError("stabilize_smoothing must be >= 1")
        if self.hdr_output not in ("none", "hdr10", "hdr10plus", "hlg"):
            raise ConfigError("hdr_output must be none|hdr10|hdr10plus|hlg")
        if self.grain_mode not in ("auto", "off", "preserve", "remove", "match"):
            raise ConfigError("grain_mode must be auto|off|preserve|remove|match")
        if self.subtitle_region not in ("bottom", "top", "full"):
            raise ConfigError("subtitle_region must be bottom|top|full")
        if self.subtitle_ocr_engine not in ("auto", "tesseract", "none"):
            raise ConfigError("subtitle_ocr_engine must be auto|tesseract|none")
        if not (0.0 <= self.max_enhancement_strength <= 1.0):
            raise ConfigError("max_enhancement_strength must be in [0, 1]")
        if self.diffusion_steps < 1 or self.diffusion_steps > 1000:
            raise ConfigError("diffusion_steps must be in [1, 1000]")
        if not (0.0 < self.diffusion_strength <= 1.0):
            raise ConfigError("diffusion_strength must be in (0, 1]")
        if self.quality_report_format not in ("json", "html", "none"):
            raise ConfigError("quality_report_format must be json|html|none")
        if self.sr_style_preset:
            from framewright_tpu.processors.guided import STYLE_PRESETS

            if self.sr_style_preset not in STYLE_PRESETS:
                raise ConfigError(
                    f"sr_style_preset must be one of {sorted(STYLE_PRESETS)}")
        if self.guidance_scale <= 0:
            raise ConfigError("guidance_scale must be > 0")
        if isinstance(self.subtitle_languages, list):
            self.subtitle_languages = tuple(self.subtitle_languages)

    # ------------------------------------------------------------------
    # Serialization
    # ------------------------------------------------------------------

    _DERIVED = ("frames_dir", "work_dir", "checkpoint_dir")

    def ensemble_models(self) -> List[str]:
        """Extra SR models to ensemble with ``sr_model`` (may be empty)."""
        return [m.strip() for m in self.sr_ensemble.split(",") if m.strip()]

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            if f.name in self._DERIVED:
                continue
            v = getattr(self, f.name)
            if isinstance(v, Path):
                v = str(v)
            elif isinstance(v, tuple):
                v = list(v)
            out[f.name] = v
        return out

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)} - set(cls._DERIVED)
        kwargs = {k: v for k, v in d.items() if k in known}
        if "mesh_shape" in kwargs and kwargs["mesh_shape"] is not None:
            kwargs["mesh_shape"] = tuple(kwargs["mesh_shape"])
        return cls(**kwargs)

    @classmethod
    def from_preset(cls, name: str, **overrides: Any) -> "Config":
        kwargs = get_preset(name)
        kwargs.update(overrides)
        kwargs.setdefault("preset", name)
        return cls(**kwargs)

    def with_overrides(self, **overrides: Any) -> "Config":
        d = self.to_dict()
        d.update(overrides)
        return Config.from_dict(d)

    def get_hash(self) -> str:
        """Stable identity hash used to key checkpoints (ref config.py:1230).

        Excludes fields that don't change output pixels (verbosity, dirs,
        checkpointing cadence) so resume survives cosmetic changes.
        """
        d = self.to_dict()
        for k in (
            "project_dir", "output_path", "verbose", "dry_run",
            "checkpoint_interval", "checkpoint_enabled", "resume",
            "keep_intermediates", "xla_cache_dir", "png_compression",
        ):
            d.pop(k, None)
        blob = json.dumps(d, sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    # ------------------------------------------------------------------
    # Files and environment
    # ------------------------------------------------------------------

    def save(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        if path.suffix in (".yaml", ".yml"):
            import yaml

            path.write_text(yaml.safe_dump(self.to_dict(), sort_keys=True))
        else:
            path.write_text(json.dumps(self.to_dict(), indent=2, sort_keys=True))

    @classmethod
    def load(cls, path: Path) -> "Config":
        path = Path(path)
        text = path.read_text()
        if path.suffix in (".yaml", ".yml"):
            import yaml

            d = yaml.safe_load(text)
        else:
            d = json.loads(text)
        return cls.from_dict(d)

    @classmethod
    def env_overrides(cls, environ: Optional[Dict[str, str]] = None) -> Dict[str, Any]:
        """Collect FRAMEWRIGHT_* env vars → config kwargs
        (same contract as ref utils/config_file.py:137)."""
        env = environ if environ is not None else dict(os.environ)
        fields = {f.name: f for f in dataclasses.fields(cls) if f.name not in cls._DERIVED}
        out: Dict[str, Any] = {}
        for key, raw in env.items():
            if not key.startswith("FRAMEWRIGHT_"):
                continue
            name = key[len("FRAMEWRIGHT_"):].lower()
            if name not in fields:
                continue
            f = fields[name]
            ftype = f.type if isinstance(f.type, str) else getattr(f.type, "__name__", "")
            try:
                if "bool" in str(ftype):
                    out[name] = raw.strip().lower() in ("1", "true", "yes", "on")
                elif "Tuple" in str(ftype) or "tuple" in str(ftype):
                    parts = [x.strip() for x in raw.split(",") if x.strip()]
                    try:
                        out[name] = tuple(int(x) for x in parts)
                    except ValueError:  # string tuples (languages etc.)
                        out[name] = tuple(parts)
                elif "int" in str(ftype):
                    out[name] = int(raw)
                elif "float" in str(ftype):
                    out[name] = float(raw)
                else:
                    out[name] = raw
            except ValueError as exc:
                raise ConfigError(f"Bad env override {key}={raw!r}: {exc}") from exc
        return out


def config_schema() -> list:
    """Grouped editable-flag schema for UI surfaces (the dashboard's
    full settings editor; reference ui.py settings panels /
    _ui_pkg/api settings). Groups come straight from the ``# --- ... ``
    section comments in the Config source, so the schema can never
    drift from the dataclass. Returns::

        [{"group": "Super-resolution",
          "fields": [{"name","type","default","choices"?}, ...]}, ...]
    """
    import dataclasses
    import inspect
    import re

    choices = {
        "compute_dtype": _VALID_DTYPES,
        "denoise_model": _VALID_DENOISERS,
        "sharding_strategy": _VALID_SHARDING,
        "sr_model": _VALID_SR_MODELS,
        "output_format": ("auto", "y4m", "png", "mp4", "mkv"),
        "ensemble_strategy": ("weighted", "median", "max_sharpness"),
        "face_model": ("gfpgan", "codeformer", "sr"),
        "grain_mode": ("auto", "off", "preserve", "remove", "match"),
        "deinterlace": ("auto", "off", "yadif", "bwdif"),
        "hdr_output": ("none", "hdr10", "hdr10plus", "hlg"),
        "quality_report_format": ("json", "html", "none"),
        "subtitle_region": ("bottom", "top", "full"),
        "temporal_model": ("attention", "latent", "ema"),
        "flow_model": ("ifnet", "raft"),
        "long_form": ("auto", "on", "off"),
    }
    fdefs = {f.name: f for f in dataclasses.fields(Config) if f.init}
    groups: list = []
    cur = None
    for line in inspect.getsource(Config).splitlines():
        m = re.match(r"\s*# --- (.+?) -*$", line)
        if m:
            title = re.sub(r"\s*\(.*\)\s*$", "", m.group(1).strip())
            cur = {"group": title, "fields": []}
            groups.append(cur)
            continue
        m = re.match(r"    (\w+):", line)
        if not (m and cur is not None and m.group(1) in fdefs):
            continue
        f = fdefs.pop(m.group(1))
        if f.default is not dataclasses.MISSING:
            default = f.default
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        else:
            default = None
        if isinstance(default, bool):
            ftype = "bool"
        elif isinstance(default, int):
            ftype = "int"
        elif isinstance(default, float):
            ftype = "float"
        else:
            ftype = "str"
            default = "" if default is None else str(default)
            if isinstance(f.default, tuple):
                default = ",".join(str(v) for v in f.default)
        entry = {"name": f.name, "type": ftype, "default": default}
        if f.name in choices:
            entry["choices"] = list(choices[f.name])
        cur["fields"].append(entry)
    return [g for g in groups if g["fields"]]


def build_config(
    preset: str = "",
    config_file: Optional[Path] = None,
    cli_overrides: Optional[Dict[str, Any]] = None,
    environ: Optional[Dict[str, str]] = None,
) -> Config:
    """Layered config resolution: CLI > env > config file > preset > defaults
    (reference precedence, cli.py:452-462)."""
    kwargs: Dict[str, Any] = {}
    if preset:
        kwargs.update(get_preset(preset))
        kwargs["preset"] = preset
    if config_file is not None:
        kwargs.update(Config.load(config_file).to_dict())
    kwargs.update(Config.env_overrides(environ))
    if cli_overrides:
        kwargs.update({k: v for k, v in cli_overrides.items() if v is not None})
    return Config.from_dict(kwargs)
