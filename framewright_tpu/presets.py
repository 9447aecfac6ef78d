"""Hardware-aware preset registry and smart selection.

Capability parity with the reference's presets/ package
(presets/registry.py:189 hardware-tier-aware preset registry,
presets/smart_selector.py:102 content+hardware -> preset): presets are
Config deltas; the registry filters/adjusts them by the detected
hardware tier; the smart selector combines a content AnalysisReport
with hardware to pick and tune one.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from framewright_tpu.config import PRESETS, Config, get_preset
from framewright_tpu.hw import HardwareInfo, HardwareTier, detect_hardware

logger = logging.getLogger(__name__)


@dataclass
class PresetInfo:
    name: str
    description: str
    min_hbm_gb: float = 0.0
    tpu_only: bool = False
    overrides: Dict = field(default_factory=dict)


class PresetRegistry:
    """Built-in presets + user registrations, filtered by hardware."""

    def __init__(self, hardware: Optional[HardwareInfo] = None):
        self.hardware = hardware or detect_hardware()
        self._extra: Dict[str, PresetInfo] = {}
        self._builtin = {
            "fast": PresetInfo("fast", PRESETS["fast"]["description"]),
            "quality": PresetInfo("quality", PRESETS["quality"]["description"],
                                  min_hbm_gb=8),
            "archive": PresetInfo("archive", PRESETS["archive"]["description"],
                                  min_hbm_gb=8),
            "ultimate": PresetInfo("ultimate", PRESETS["ultimate"]["description"],
                                   min_hbm_gb=12),
        }

    def register(self, info: PresetInfo) -> None:
        self._extra[info.name] = info

    def available(self) -> List[PresetInfo]:
        hbm_gb = self.hardware.hbm_per_device / 2**30
        out = []
        for info in {**self._builtin, **self._extra}.values():
            if info.tpu_only and self.hardware.platform != "tpu":
                continue
            if hbm_gb and hbm_gb < info.min_hbm_gb:
                continue
            out.append(info)
        return sorted(out, key=lambda i: i.name)

    def build_config(self, name: str, **overrides) -> Config:
        base = {}
        if name in self._builtin:
            base = get_preset(name)
        elif name in self._extra:
            base = dict(self._extra[name].overrides)
        else:
            from framewright_tpu.errors import ConfigError

            raise ConfigError(f"Unknown preset {name!r}")
        base.update(overrides)
        base.setdefault("preset", name)
        cfg = Config(**base)
        return self.adjust_for_hardware(cfg)

    def adjust_for_hardware(self, cfg: Config) -> Config:
        """Downshift settings that the hardware can't sustain (the
        registry's tier adaptation; the VRAM-tier analog)."""
        hw = self.hardware
        adjust = {}
        if hw.tier is HardwareTier.CPU_ONLY:
            # CPU: compact model, fp32 (CPU bf16 is emulated), no tiling games
            if cfg.sr_model.startswith("RealESRGAN"):
                adjust["sr_model"] = "realesr-general-x4v3"
                adjust["scale_factor"] = 4 if cfg.scale_factor > 2 else cfg.scale_factor
            adjust["compute_dtype"] = "float32"
        hbm_gb = hw.hbm_per_device / 2**30
        if 0 < hbm_gb < 8 and cfg.tile_size == 0:
            adjust["tile_size"] = 256
        if adjust:
            logger.info("hardware adjustment: %s", adjust)
            return cfg.with_overrides(**adjust)
        return cfg


class SmartPresetSelector:
    """Content analysis + hardware -> preset choice + tuned overrides
    (reference presets/smart_selector.py:102)."""

    def __init__(self, registry: Optional[PresetRegistry] = None):
        self.registry = registry or PresetRegistry()

    def select(self, report, nb_frames: int = 0) -> Config:
        """report: processors.analysis.AnalysisReport."""
        _, _, cfg = self.select_with_info(report, nb_frames)
        return cfg

    def select_with_info(self, report, nb_frames: int = 0):
        """-> (preset_name, overrides, Config): the recommendation with
        its provenance, for UIs that show an editable preset diff
        (reference _ui_pkg/recommendations.py:98)."""
        from framewright_tpu.processors.analysis import recommend_settings

        names = {p.name for p in self.registry.available()}
        if report.quality_score < 50 and "archive" in names:
            preset = "archive"
        elif report.quality_score < 75 and "quality" in names:
            preset = "quality"
        else:
            preset = "fast"
        overrides = recommend_settings(report)
        # very long videos: keep the fast model regardless
        if nb_frames > 100_000:
            overrides["sr_model"] = "realesr-general-x4v3"
        logger.info("smart selector: preset=%s overrides=%s", preset, overrides)
        return preset, overrides, self.registry.build_config(preset, **overrides)
