"""Export presets, sidecar metadata, and comparison artifacts.

Capability parity with the reference's export layer (export/presets.py:
121-601 platform encode presets, export/sidecar.py:258 JSON sidecar
metadata, export/comparison_viewer.py HTML before/after viewer,
thumbnail grid).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


@dataclass(frozen=True)
class ExportPreset:
    name: str
    description: str
    codec: str = "libx265"
    crf: int = 18
    encode_preset: str = "medium"
    pixel_format: str = "yuv420p"
    max_height: int = 0          # 0 = keep
    target_fps: float = 0.0      # 0 = keep
    extra_args: tuple = ()


EXPORT_PRESETS: Dict[str, ExportPreset] = {
    p.name: p for p in [
        ExportPreset("youtube", "YouTube upload (H.264 high bitrate)",
                     codec="libx264", crf=17, encode_preset="slow",
                     extra_args=("-movflags", "+faststart")),
        ExportPreset("youtube_hdr", "YouTube HDR10",
                     codec="libx265", crf=16, pixel_format="yuv420p10le",
                     extra_args=("-x265-params",
                                 "hdr10=1:colorprim=bt2020:transfer=smpte2084")),
        ExportPreset("vimeo", "Vimeo upload", codec="libx264", crf=16,
                     encode_preset="slow"),
        ExportPreset("archive", "Archival master (near-lossless HEVC)",
                     codec="libx265", crf=10, encode_preset="slow"),
        ExportPreset("archive_ffv1", "Archival lossless (FFV1)",
                     codec="ffv1", crf=0),
        ExportPreset("web", "Web embed (small H.264)", codec="libx264",
                     crf=23, encode_preset="medium", max_height=1080),
        ExportPreset("mobile", "Mobile-friendly", codec="libx264", crf=24,
                     max_height=720),
        ExportPreset("plex", "Plex/Jellyfin direct play", codec="libx264",
                     crf=18),
        ExportPreset("prores_proxy", "Editing proxy (ProRes)",
                     codec="prores_ks", crf=0,
                     extra_args=("-profile:v", "0")),
    ]
}


def get_export_preset(name: str) -> ExportPreset:
    from framewright_tpu.errors import ConfigError

    if name not in EXPORT_PRESETS:
        raise ConfigError(
            f"Unknown export preset {name!r}; available: {sorted(EXPORT_PRESETS)}")
    return EXPORT_PRESETS[name]


def apply_export_preset(config, name: str):
    """Return a Config updated with the preset's encode settings."""
    p = get_export_preset(name)
    return config.with_overrides(
        codec=p.codec, crf=p.crf, encode_preset=p.encode_preset,
        pixel_format=p.pixel_format,
    )


# ---------------------------------------------------------------------------
# Sidecar metadata
# ---------------------------------------------------------------------------

def write_sidecar(output_path: Path, config, result, source: str) -> Path:
    """JSON sidecar documenting how the output was produced (reference
    export/sidecar.py:258)."""
    from framewright_tpu import __version__

    sidecar = {
        "framewright_tpu_version": __version__,
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "source": str(source),
        "output": str(output_path),
        "config": config.to_dict(),
        "config_hash": config.get_hash(),
        "frames_out": result.frames_out,
        "duration_s": round(result.duration_s, 2),
        "quality": result.quality.to_dict() if result.quality else None,
    }
    path = Path(str(output_path) + ".json")
    path.write_text(json.dumps(sidecar, indent=2))
    return path


# ---------------------------------------------------------------------------
# Comparison artifacts
# ---------------------------------------------------------------------------

def comparison_grid(before: List[np.ndarray], after: List[np.ndarray],
                    max_cols: int = 4) -> np.ndarray:
    """Side-by-side thumbnail grid image (before|after pairs stacked)."""
    import jax.numpy as jnp

    from framewright_tpu.models.layers import resize_bilinear

    assert len(before) == len(after) and before
    th = 120
    pairs = []
    for b, a in zip(before[:max_cols], after[:max_cols]):
        tw_b = max(2, int(round(b.shape[1] * th / b.shape[0])))
        rb = np.asarray(resize_bilinear(
            jnp.asarray(b[None], jnp.float32) / 255.0, (th, tw_b)))[0]
        ra = np.asarray(resize_bilinear(
            jnp.asarray(a[None], jnp.float32) / 255.0, (th, tw_b)))[0]
        divider = np.ones((th, 2, 3), np.float32)
        pairs.append(np.concatenate([rb, divider, ra], axis=1))
    sep = np.ones((pairs[0].shape[0], 6, 3), np.float32) * 0.5
    row = pairs[0]
    for p in pairs[1:]:
        row = np.concatenate([row, sep, p], axis=1)
    return np.clip(row * 255 + 0.5, 0, 255).astype(np.uint8)


def comparison_html(before_png: str, after_png: str, title: str = "Comparison") -> str:
    """Self-contained before/after slider viewer (reference
    export/comparison_viewer.py:471). Image paths are relative refs."""
    return f"""<!doctype html><html><head><meta charset="utf-8"><title>{title}</title>
<style>
body{{font-family:system-ui;margin:2rem;background:#111;color:#eee}}
.wrap{{position:relative;max-width:960px;overflow:hidden}}
.wrap img{{display:block;width:100%}}
.after{{position:absolute;inset:0;clip-path:inset(0 50% 0 0)}}
input[type=range]{{width:100%;max-width:960px}}
</style></head><body><h1>{title}</h1>
<div class="wrap"><img src="{before_png}" alt="before">
<div class="after"><img src="{after_png}" alt="after"></div></div>
<input type="range" min="0" max="100" value="50" oninput="
document.querySelector('.after').style.clipPath='inset(0 '+(100-this.value)+'% 0 0)'">
<p>Drag the slider: left = before, right = after.</p></body></html>"""
