"""Recipe library: named end-to-end restoration workflows.

Capability parity with the reference's recipes (recipes/library.py:
vhs_family_video, silent_film_restoration, dvd_upscale, etc., with the
step-by-step executor recipes/executor.py:49): each recipe is a Config
delta plus ordered pre-stages, executable through VideoRestorer.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from framewright_tpu.config import Config
from framewright_tpu.errors import ConfigError

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class Recipe:
    name: str
    description: str
    config_overrides: Dict = field(default_factory=dict)
    pre_stages: tuple = ()         # processor names run before enhance
    notes: str = ""


RECIPES: Dict[str, Recipe] = {
    r.name: r for r in [
        Recipe(
            "vhs_family_video",
            "Home VHS tapes: tracking/dropout repair, deinterlace, mild "
            "denoise, 2x upscale",
            config_overrides=dict(
                scale_factor=2, sr_model="RealESRGAN_x2plus", denoise=True,
                denoise_strength=0.6, deinterlace="yadif",
                temporal_consistency=True, crf=18,
            ),
            pre_stages=("vhs", "deinterlace"),
        ),
        Recipe(
            "silent_film_restoration",
            "Pre-1930 film: dedup pulldown padding, defect repair, "
            "gate-weave stabilization, flicker fix, interpolate to 24fps",
            config_overrides=dict(
                scale_factor=2, sr_model="RealESRGAN_x2plus",
                deduplicate=True, interpolation=True, target_fps=24.0,
                denoise=True, temporal_consistency=True, defect_repair=True,
                grain_preserve=True, crf=14,
            ),
            pre_stages=("defects", "gate_weave"),
        ),
        Recipe(
            "dvd_upscale",
            "480p/576p DVD rips: deinterlace/IVTC, deblock, 4x upscale",
            config_overrides=dict(
                scale_factor=4, sr_model="RealESRGAN_x4plus",
                deinterlace="auto", inverse_telecine=True, denoise=True,
                denoise_strength=0.4, crf=17,
            ),
            pre_stages=("telecine", "deinterlace"),
        ),
        Recipe(
            "anime_remaster",
            "Animated content: anime-tuned model, strong line cleanup",
            config_overrides=dict(
                scale_factor=4, sr_model="RealESRGAN_x4plus_anime_6B",
                denoise=False, crf=16,
            ),
        ),
        Recipe(
            "bw_archive_colorize",
            "B&W archive: full restore + colorization pass",
            config_overrides=dict(
                scale_factor=2, sr_model="RealESRGAN_x2plus", denoise=True,
                colorize=True, grain_preserve=True,
                temporal_consistency=True, crf=14,
            ),
            pre_stages=("defects",),
        ),
        Recipe(
            "youtube_ready",
            "Fast cleanup + 2x for web upload",
            config_overrides=dict(
                scale_factor=2, sr_model="realesr-general-x4v3",
                outscale=2.0, denoise=False, crf=18, codec="libx264",
            ),
        ),
        Recipe(
            "realtime_preview",
            "Near-realtime 2x with the trained-in-repo compact model "
            "(22 fps/chip; packaged weights, works with no downloads)",
            config_overrides=dict(
                scale_factor=2, sr_model="FW_fastvgg_x2",
                outscale=2.0, denoise=False, validate_output=False,
            ),
        ),
        Recipe(
            "home_movie_8mm",
            "8mm/Super8 transfers: heavy gate weave + grain management",
            config_overrides=dict(
                scale_factor=2, sr_model="RealESRGAN_x2plus",
                stabilize=True, denoise=True, grain_preserve=True,
                temporal_consistency=True, deduplicate=True,
                interpolation=True, target_fps=24.0, crf=15,
            ),
            pre_stages=("gate_weave",),
        ),
    ]
}


def get_recipe(name: str) -> Recipe:
    if name not in RECIPES:
        raise ConfigError(f"Unknown recipe {name!r}; available: {sorted(RECIPES)}")
    return RECIPES[name]


def recipe_config(name: str, **overrides) -> Config:
    r = get_recipe(name)
    kwargs = dict(r.config_overrides)
    kwargs.update(overrides)
    return Config(**kwargs)


class RecipeExecutor:
    """Run a recipe: pre-stage processors stream into a temp artifact,
    then the main restore pipeline runs with the recipe's config."""

    def __init__(self, recipe: Recipe, project_dir: Path):
        self.recipe = recipe
        self.project_dir = Path(project_dir)

    def execute(self, source: Path, output: Optional[Path] = None):
        from framewright_tpu.io import open_reader, open_writer
        from framewright_tpu.restorer import VideoRestorer

        source = Path(source)
        work = source
        kwargs = dict(self.recipe.config_overrides)
        kwargs["project_dir"] = self.project_dir
        cfg = Config(**kwargs)
        # pre-stages (host-side streams)
        if self.recipe.pre_stages:
            staged = self.project_dir / "work" / f"prestaged{source.suffix or '.y4m'}"
            staged.parent.mkdir(parents=True, exist_ok=True)
            with open_reader(source) as r:
                stream = iter(r)
                for stage in self.recipe.pre_stages:
                    stream = self._wrap_stage(stage, stream)
                w = open_writer(staged, r.width, r.height, fps=r.fps)
                n = 0
                for frame in stream:
                    w.write_frame(frame)
                    n += 1
                w.close()
            logger.info("recipe pre-stages %s: %d frames", self.recipe.pre_stages, n)
            work = staged
        return VideoRestorer(cfg).restore_video(work, output=output)

    @staticmethod
    def _wrap_stage(stage: str, stream):
        if stage == "vhs":
            from framewright_tpu.processors.vhs import VHSProcessor

            return VHSProcessor().process_stream(stream)
        if stage == "deinterlace":
            from framewright_tpu.processors.format import Deinterlacer

            return Deinterlacer().process_stream(stream)
        if stage == "telecine":
            from framewright_tpu.processors.format import InverseTelecine

            return InverseTelecine().process_stream(stream)
        if stage == "defects":
            from framewright_tpu.processors.film import DefectRepairer

            return DefectRepairer().process_stream(stream)
        if stage == "gate_weave":
            from framewright_tpu.processors.film import GateWeaveStabilizer

            frames = list(stream)
            return iter(GateWeaveStabilizer().stabilize(frames))
        raise ConfigError(f"Unknown recipe pre-stage {stage!r}")
