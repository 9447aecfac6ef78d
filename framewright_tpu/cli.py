"""framewright-tpu command-line interface.

Mirrors the reference's CLI shape (cli.py:2414-4647: `framewright
video.mp4` just works; subcommands for models/presets/hardware/analyze;
layered config precedence CLI > env > config file > preset). Round-1
verb set — the reference's full ~60-verb surface lands as the
corresponding subsystems come online.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path
from typing import List, Optional

from framewright_tpu import __version__
from framewright_tpu.config import PRESETS, Config, build_config
from framewright_tpu.errors import FramewrightError
from framewright_tpu.logging_utils import setup_logging

logger = logging.getLogger(__name__)


def _add_restore_args(p: argparse.ArgumentParser,
                      with_source: bool = True) -> None:
    if with_source:
        p.add_argument("source",
                       help="input video (.y4m, frame dir, or any ffmpeg format)")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--preset", choices=sorted(PRESETS), default="")
    p.add_argument("--profile", default="", help="named saved profile")
    p.add_argument("--save-profile", default="", help="save resolved config as profile")
    p.add_argument("--config-file", type=Path, default=None)
    p.add_argument("--scale", dest="scale_factor", type=int, choices=[1, 2, 3, 4])
    p.add_argument("--model", dest="sr_model")
    p.add_argument("--ensemble", dest="sr_ensemble",
                   help="comma list of extra SR models to ensemble with --model")
    p.add_argument("--ensemble-strategy", dest="ensemble_strategy",
                   choices=["weighted", "median", "max_sharpness"])
    p.add_argument("--tile", dest="tile_size", type=int)
    p.add_argument("--batch", dest="batch_size", type=int)
    p.add_argument("--dtype", dest="compute_dtype",
                   choices=["bfloat16", "float32", "int8"])
    p.add_argument("--device", dest="device_platform", choices=["auto", "tpu", "cpu"])
    p.add_argument("--deduplicate", action="store_true", default=None)
    p.add_argument("--denoise", action="store_true", default=None)
    p.add_argument("--denoise-method", dest="denoise_model",
                   choices=["auto", "temporal", "nafnet", "restormer",
                            "bilateral"],
                   help="auto profiles the noise (luma/chroma/temporal/"
                        "grain) and picks denoiser + strength")
    p.add_argument("--interpolate", dest="interpolation", action="store_true", default=None)
    p.add_argument("--target-fps", dest="target_fps", type=float)
    p.add_argument("--face-restore", dest="face_restore", action="store_true", default=None)
    p.add_argument("--face-model", dest="face_model",
                   choices=["gfpgan", "codeformer", "sr"])
    p.add_argument("--face-fidelity", dest="face_fidelity", type=float,
                   help="codeformer fidelity weight (0 quality .. 1 fidelity)")
    p.add_argument("--colorize", action="store_true", default=None)
    p.add_argument("--colorize-method", dest="colorize_model",
                   choices=["palette", "exemplar", "eccv16", "ddcolor"])
    p.add_argument("--stabilize", action="store_true", default=None,
                   help="full-frame stabilization (camera shake removal)")
    p.add_argument("--stabilize-smoothing", dest="stabilize_smoothing",
                   type=int, help="trajectory smoothing radius, frames")
    p.add_argument("--stabilize-crop", dest="stabilize_crop", type=float,
                   help="retained frame fraction after crop-zoom")
    p.add_argument("--long-form", dest="long_form",
                   choices=["auto", "on", "off"],
                   help="global anchor drift correction for long videos")
    p.add_argument("--defect-repair", dest="defect_repair",
                   action="store_true", default=None)
    p.add_argument("--temporal-consistency", dest="temporal_consistency",
                   action="store_true", default=None,
                   help="flicker reduction pass")
    p.add_argument("--temporal-model", dest="temporal_model",
                   choices=["attention", "ema"])
    p.add_argument("--flow-model", dest="flow_model",
                   choices=["ifnet", "raft"],
                   help="optical-flow backend for alignment stages")
    p.add_argument("--qp-removal", dest="qp_removal", action="store_true",
                   default=None, help="codec deblocking/deringing")
    p.add_argument("--auto-enhance", dest="auto_enhance", action="store_true",
                   default=None,
                   help="analyze content and toggle restoration stages")
    p.add_argument("--scene-adaptive", dest="scene_adaptive",
                   action="store_true", default=None,
                   help="per-scene content-aware strength modulation")
    p.add_argument("--vhs", dest="vhs_restore", action="store_true",
                   default=None,
                   help="VHS artifact repair (tracking/dropouts/chroma)")
    p.add_argument("--fill-missing-frames", dest="fill_missing_frames",
                   action="store_true", default=None,
                   help="synthesize dropped frames (motion-gap detection)")
    p.add_argument("--hdr", dest="hdr_output",
                   choices=["none", "hdr10", "hdr10plus", "hlg"],
                   help="export expanded HDR (PQ/HLG-encoded; hdr10plus "
                        "adds an ST 2094-40 dynamic-metadata sidecar)")
    p.add_argument("--grain", dest="grain_mode",
                   choices=["auto", "off", "preserve", "remove", "match"],
                   help="post-SR film-grain handling")
    p.add_argument("--max-enhancement", dest="max_enhancement_strength",
                   type=float,
                   help="authenticity guard: cap enhancement blend (0-1)")
    p.add_argument("--prompt", dest="sr_prompt",
                   help="guided enhancement style prompt "
                        "(e.g. 'sharp warm cinematic grain')")
    p.add_argument("--style", dest="sr_style_preset",
                   help="named style preset (natural, cinematic, anime, "
                        "vintage, documentary, portrait)")
    p.add_argument("--reference-dir", dest="reference_images_dir", type=Path,
                   help="match color/grain statistics to stills in this dir")
    p.add_argument("--qp-strength", dest="qp_strength", type=float,
                   help="DCT threshold; 0 = auto from blockiness")
    p.add_argument("--crf", type=int)
    p.add_argument("--codec")
    p.add_argument("--no-checkpoint", dest="checkpoint_enabled",
                   action="store_false", default=None)
    p.add_argument("--no-resume", dest="resume", action="store_false", default=None)
    p.add_argument("--no-validate", dest="validate_output",
                   action="store_false", default=None)
    p.add_argument("--min-vmaf", dest="min_vmaf", type=float,
                   help="perceptual quality gate (vmaf_proxy 0-100; 0=off)")
    p.add_argument("--project-dir", dest="project_dir", type=Path)
    p.add_argument("--weights-dir", type=Path, default=None)
    p.add_argument("--dry-run", dest="dry_run", action="store_true", default=None)
    p.add_argument("--verbose", "-v", action="store_true", default=None)


def _config_from_args(args: argparse.Namespace) -> Config:
    skip = {"source", "output", "command", "config_file", "preset",
            "weights_dir", "func", "profile", "save_profile"}
    overrides = {
        k: v for k, v in vars(args).items()
        if k not in skip and v is not None
    }
    if getattr(args, "profile", ""):
        # profile sits between preset and CLI flags in precedence
        from framewright_tpu.profiles import load_profile

        base = load_profile(args.profile).to_dict()
        base.update(overrides)
        overrides = base
    cfg = build_config(
        preset=getattr(args, "preset", "") or "",
        config_file=getattr(args, "config_file", None),
        cli_overrides=overrides,
    )
    if getattr(args, "save_profile", ""):
        from framewright_tpu.profiles import save_profile

        save_profile(args.save_profile, cfg)
    return cfg


def cmd_restore(args: argparse.Namespace) -> int:
    from framewright_tpu.restorer import ProgressInfo, VideoRestorer

    cfg = _config_from_args(args)
    setup_logging(logging.DEBUG if cfg.verbose else logging.INFO)
    if cfg.device_platform != "auto":
        # must run before any jax computation; the axon TPU plugin
        # ignores the JAX_PLATFORMS env var, so use the config API
        import jax

        jax.config.update("jax_platforms", cfg.device_platform)
    if args.weights_dir:
        import os

        os.environ["FRAMEWRIGHT_WEIGHTS_DIR"] = str(args.weights_dir)

    last = {"stage": None}

    def on_progress(info: ProgressInfo):
        if info.stage != last["stage"]:
            print(f"\n[{info.stage}]", file=sys.stderr)
            last["stage"] = info.stage
        print(
            f"\r  {info.frames_done}/{info.total_frames} frames "
            f"({info.percent:.1f}%)  {info.fps:.2f} fps  ETA {info.eta_s:.0f}s ",
            end="", file=sys.stderr,
        )

    source = args.source
    if isinstance(source, str) and source.startswith(("http://", "https://")):
        # URL sources download first (reference: yt-dlp front end)
        from framewright_tpu.io.download import download_video

        try:
            source = download_video(source,
                                    cfg.project_dir / "downloads" / "source.mp4")
        except FramewrightError as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1

    restorer = VideoRestorer(cfg, progress_callback=on_progress)
    try:
        result = restorer.restore_video(source, output=args.output)
    except FramewrightError as exc:
        print(f"\nerror: {exc}", file=sys.stderr)
        return 1
    print("", file=sys.stderr)
    summary = {
        "output": str(result.output_path),
        "frames": result.frames_out,
        "seconds": round(result.duration_s, 1),
        "fps": round(result.fps, 2),
    }
    if result.dedup:
        summary["duplicates_removed"] = result.dedup.duplicates
    if result.quality:
        summary["quality"] = result.quality.to_dict()
    print(json.dumps(summary, indent=2))
    return 0


def cmd_probe(args: argparse.Namespace) -> int:
    from framewright_tpu.io import probe

    meta = probe(args.source)
    print(json.dumps({
        "width": meta.width, "height": meta.height, "fps": meta.fps,
        "frames": meta.nb_frames, "container": meta.container,
        "has_audio": meta.has_audio,
    }, indent=2))
    return 0


def cmd_check(args: argparse.Namespace) -> int:
    from framewright_tpu.hw import check_hardware

    print(json.dumps(check_hardware(), indent=2))
    return 0


def cmd_presets(args: argparse.Namespace) -> int:
    for name, preset in sorted(PRESETS.items()):
        print(f"{name:10s} - {preset.get('description', '')}")
    return 0


def cmd_models(args: argparse.Namespace) -> int:
    from framewright_tpu.models.registry import MODEL_SPECS, default_weights_dir

    action = getattr(args, "action", "list") or "list"
    wdir = default_weights_dir()
    if action == "list":
        from framewright_tpu.models.registry import packaged_weights_dir

        pkg_weights = packaged_weights_dir()
        for name, spec in sorted(MODEL_SPECS.items()):
            if (wdir / f"{name}.npz").exists() or \
                    (wdir / f"{name}.pth").exists():
                have = "cached"
            elif (pkg_weights / f"{name}.npz").exists():
                have = "packaged"      # trained-in-repo checkpoint
            else:
                have = "missing"
            print(f"{name:32s} x{spec.scale}  {spec.family:8s} [{have}]")
            if args.verbose:
                print(f"    {spec.url}")
        return 0
    if action == "guide":
        # when-to-use guidance (reference ui.py "AI Model Guide")
        from framewright_tpu.models.registry import MODEL_GUIDE

        for name, spec in sorted(MODEL_SPECS.items()):
            tip = MODEL_GUIDE.get(name)
            if tip:
                print(f"{name:32s} x{spec.scale}  {tip}")
        return 0
    if action == "port":
        # torch .pth -> cached .npz in the weights dir
        from framewright_tpu.models.registry import get_model
        from framewright_tpu.models import torch_port

        spec = get_model(args.name)
        src = Path(args.path) if args.path else wdir / f"{args.name}.pth"
        if not src.exists():
            print(f"error: checkpoint not found: {src}", file=sys.stderr)
            return 1
        sd = torch_port.load_state_dict(src)
        params = spec.port_fn(sd)
        out = wdir / f"{args.name}.npz"
        torch_port.export_npz(params, out)
        print(str(out))
        return 0
    if action == "verify":
        # validate a REAL checkpoint: key inventory vs the recorded
        # manifest, structure-complete port, and (when a torch reference
        # exists for the family) a numeric parity check vs PyTorch
        import json

        import numpy as np

        from framewright_tpu.models import torch_port, torch_ref
        from framewright_tpu.models.registry import get_model

        try:
            # parity forwards are tiny: run on CPU (a TPU here would pay
            # a remote compile for nothing; axon ignores JAX_PLATFORMS)
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass
        spec = get_model(args.name)
        src = Path(args.path) if args.path else wdir / f"{args.name}.pth"
        if not src.exists():
            print(f"error: checkpoint not found: {src}", file=sys.stderr)
            return 1
        sd = torch_port.load_state_dict(src)
        manifest = (Path(__file__).parent / "models" / "manifests"
                    / f"{args.name}.json")
        rc = 0
        if manifest.exists():
            doc = json.loads(manifest.read_text())
            want = set(doc["keys"]) - set(doc.get("ignorable", []))
            have = set(sd) - set(doc.get("ignorable", []))
            missing = sorted(want - have)
            extra = sorted(have - want)
            shape_bad = [k for k in (want & have)
                         if list(np.asarray(sd[k]).shape) != doc["keys"][k]]
            print(f"manifest: {len(want)} keys expected, "
                  f"{len(missing)} missing, {len(extra)} unexpected, "
                  f"{len(shape_bad)} shape mismatches")
            for k in (missing[:5] + extra[:5] + shape_bad[:5]):
                print(f"  ! {k}")
            if missing or shape_bad:
                rc = 1
        else:
            print("no manifest recorded for this model (inventory "
                  "check skipped)")
        params = spec.port_fn(sd)
        n = sum(int(np.prod(np.asarray(p).shape))
                for p in __import__("jax").tree_util.tree_leaves(params))
        print(f"port: OK ({n/1e6:.2f}M params)")
        try:
            res = torch_ref.parity_check(args.name, sd, spec.arch_config,
                                         spec.family)
            gate = res["psnr_db"] >= 45.0
            print(f"parity vs torch: {res['psnr_db']:.1f} dB PSNR, "
                  f"max|diff| {res['max_abs']:.2e} "
                  f"[{'PASS' if gate else 'FAIL <45 dB'}]")
            if not gate:
                rc = 1
        except ValueError as exc:
            print(f"parity: skipped ({exc})")
        except ImportError:
            print("parity: skipped (torch not installed)")
        return rc
    if action == "download":
        import urllib.request

        from framewright_tpu.models.registry import get_model

        spec = get_model(args.name)
        wdir.mkdir(parents=True, exist_ok=True)
        dst = wdir / f"{args.name}.pth"
        print(f"downloading {spec.url} -> {dst}", file=sys.stderr)
        try:
            urllib.request.urlretrieve(spec.url, dst)
        except OSError as exc:
            print(f"error: download failed ({exc}); fetch manually from "
                  f"{spec.url} and place at {dst}", file=sys.stderr)
            return 1
        print(str(dst))
        return 0
    return 1


def cmd_analyze(args: argparse.Namespace) -> int:
    from framewright_tpu.io import open_reader, probe
    from framewright_tpu.processors.deduplication import DedupConfig, FrameDeduplicator
    from framewright_tpu.processors.scene_detection import SceneDetector

    meta = probe(args.source)
    with open_reader(args.source) as r:
        dedup = FrameDeduplicator(DedupConfig()).analyze(iter(r), target_fps=meta.fps)
    with open_reader(args.source) as r:
        scenes = SceneDetector().analyze(iter(r))
    report = {
        "input": f"{meta.width}x{meta.height}@{meta.fps:.2f}",
        "frames": meta.nb_frames,
        "unique_frames": dedup.unique_frames,
        "duplicate_ratio": round(dedup.dedup_ratio, 3),
        "estimated_source_fps": dedup.estimated_source_fps,
        "scenes": len(scenes.scene_ranges()),
        "scene_boundaries": scenes.boundaries[:50],
        "recommendation": {
            "deduplicate": dedup.dedup_ratio > 0.1,
            "interpolate_to_fps": meta.fps if dedup.dedup_ratio > 0.1 else 0,
        },
    }
    if getattr(args, "intelligence", False):
        # per-scene content map (reference scene_intelligence.py:293)
        from framewright_tpu.processors.scene_intelligence import SceneIntelligence

        si = SceneIntelligence()
        with open_reader(args.source) as r:
            analyses = si.analyze_video(iter(r))
        report["scene_intelligence"] = si.get_summary(analyses)
        report["adaptive_settings"] = {
            f: s.to_dict()
            for f, s in list(si.generate_processing_map(analyses).items())[:20]
        }
    print(json.dumps(report, indent=2))
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import runpy

    runpy.run_path(str(Path(__file__).resolve().parent.parent / "bench.py"),
                   run_name="__main__")
    return 0


def cmd_warmup(args: argparse.Namespace) -> int:
    """Prewarm the persistent XLA compilation cache for the production
    SR program at a target geometry, so the first real restore loads
    serialized executables instead of cold-compiling (~6 min on the
    remote compile server; the TensorRT engine-cache analog)."""
    from framewright_tpu.warmup import warmup_sr

    height, width = args.height, args.width
    output_color = args.output_color
    batches = ([int(b) for b in args.batches.split(",")]
               if args.batches else None)
    for k in ("height", "width", "output_color", "batches"):
        delattr(args, k)  # warmup-only flags, not Config fields
    cfg = _config_from_args(args)
    setup_logging(logging.DEBUG if cfg.verbose else logging.INFO)
    if cfg.device_platform != "auto":
        # must run before any jax computation; the axon TPU plugin
        # ignores the JAX_PLATFORMS env var, so use the config API
        import jax

        jax.config.update("jax_platforms", cfg.device_platform)
    res = warmup_sr(height, width, cfg,
                    output_color=output_color, batches=batches,
                    progress=print)
    print(f"cache: {res['cache_dir']}  plan batch: {res['plan_batch']}")
    return 0


def cmd_suite(args: argparse.Namespace) -> int:
    from framewright_tpu.benchmarks import BenchmarkRunner, standard_suite

    runner = BenchmarkRunner(Path(args.work_dir), iterations=args.iterations,
                             device=args.device)
    results = runner.run_suite(standard_suite(tiny=args.tiny))
    for r in results:
        print(f"{r.case:20s} {r.fps:8.2f} fps  ({r.frames} frames in {r.seconds}s)")
    if args.output:
        runner.save_results(results, Path(args.output))
    return 0


def cmd_recipes(args: argparse.Namespace) -> int:
    from framewright_tpu.recipes import RECIPES

    for name, r in sorted(RECIPES.items()):
        print(f"{name:28s} - {r.description}")
    return 0


def cmd_recipe(args: argparse.Namespace) -> int:
    from framewright_tpu.recipes import RecipeExecutor, get_recipe

    recipe = get_recipe(args.name)
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    ex = RecipeExecutor(recipe, Path(args.project_dir))
    result = ex.execute(args.source, output=args.output)
    print(json.dumps({"output": str(result.output_path),
                      "frames": result.frames_out,
                      "seconds": round(result.duration_s, 1)}, indent=2))
    return 0


def cmd_auto(args: argparse.Namespace) -> int:
    """Analyze content, pick settings, restore (--auto-enhance path)."""
    from framewright_tpu.io import open_reader, probe
    from framewright_tpu.presets import PresetRegistry, SmartPresetSelector
    from framewright_tpu.processors.analysis import ContentAnalyzer
    from framewright_tpu.restorer import VideoRestorer

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    meta = probe(args.source)
    with open_reader(args.source) as r:
        report = ContentAnalyzer().analyze(iter(r), height=meta.height)
    print("analysis:", json.dumps(report.to_dict(), indent=2), file=sys.stderr)
    cfg = SmartPresetSelector(PresetRegistry()).select(report, meta.nb_frames)
    cfg = cfg.with_overrides(project_dir=str(args.project_dir))
    result = VideoRestorer(cfg).restore_video(args.source, output=args.output)
    print(json.dumps({"output": str(result.output_path),
                      "preset": cfg.preset,
                      "frames": result.frames_out}, indent=2))
    return 0


def cmd_do(args: argparse.Namespace) -> int:
    """Natural-language command ('framewright do \"restore my vhs ...\"')."""
    from framewright_tpu.nlp import build_config_from_text
    from framewright_tpu.restorer import VideoRestorer

    cfg, cmd = build_config_from_text(args.text,
                                      project_dir=str(args.project_dir))
    print(cmd.describe(), file=sys.stderr)
    source = args.source or cmd.source
    if not source:
        print("error: no input file found in the command; pass --source",
              file=sys.stderr)
        return 1
    if args.dry_run:
        print(json.dumps(cfg.to_dict(), indent=2))
        return 0
    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    result = VideoRestorer(cfg).restore_video(source, output=args.output)
    print(json.dumps({"output": str(result.output_path),
                      "frames": result.frames_out}, indent=2))
    return 0


def cmd_batch(args: argparse.Namespace) -> int:
    from framewright_tpu.batch import BatchQueueProcessor
    from framewright_tpu.persistence import JobStore

    store = JobStore(Path(args.db))
    q = BatchQueueProcessor(store)
    if args.action == "submit":
        jid = q.submit(args.source, args.output or "")
        print(jid)
    elif args.action == "list":
        for job in store.list_jobs():
            print(f"{job.job_id}  {job.state:10s} {job.frames_done:6d}f  {job.source}")
    elif args.action == "run":
        q.resume_crashed()
        n = q.run_until_empty()
        print(f"processed {n} jobs")
    return 0


def cmd_watch(args: argparse.Namespace) -> int:
    from framewright_tpu.batch import BatchQueueProcessor, WatchFolder
    from framewright_tpu.persistence import JobStore

    store = JobStore(Path(args.db))
    q = BatchQueueProcessor(store)
    wf = WatchFolder(Path(args.directory), q, poll_s=args.poll,
                     output_dir=Path(args.output_dir) if args.output_dir else None)
    print(f"watching {args.directory} (ctrl-c to stop)", file=sys.stderr)
    try:
        wf.run(max_cycles=args.cycles)
    except KeyboardInterrupt:
        pass
    return 0


def cmd_qa_report(args: argparse.Namespace) -> int:
    from framewright_tpu.reports import QAReport

    rep = QAReport(source=args.source, output=args.output or "")
    path = rep.save(Path(args.report))
    print(str(path))
    return 0


def cmd_export_presets(args: argparse.Namespace) -> int:
    from framewright_tpu.export import EXPORT_PRESETS

    for name, p in sorted(EXPORT_PRESETS.items()):
        print(f"{name:16s} {p.codec:12s} crf={p.crf:<3d} - {p.description}")
    return 0


def cmd_wizard(args: argparse.Namespace) -> int:
    from framewright_tpu.wizard import Wizard

    cfg = Wizard().run(project_dir=str(args.project_dir))
    if args.save_profile:
        from framewright_tpu.profiles import save_profile

        save_profile(args.save_profile, cfg)
        print(f"saved profile {args.save_profile!r}", file=sys.stderr)
    if not args.source:
        print(json.dumps(cfg.to_dict(), indent=2))
        return 0
    from framewright_tpu.restorer import VideoRestorer

    result = VideoRestorer(cfg).restore_video(args.source, output=args.output)
    print(json.dumps({"output": str(result.output_path),
                      "frames": result.frames_out}, indent=2))
    return 0


def cmd_interpolate(args: argparse.Namespace) -> int:
    """Standalone frame interpolation (reference `framewright
    interpolate`, cli.py interpolate verb)."""
    from framewright_tpu.io import open_reader, open_writer, probe
    from framewright_tpu.processors.interpolation import (
        FrameInterpolator,
        InterpolationConfig,
        interpolation_factor,
    )

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    meta = probe(args.source)
    target = args.target_fps or meta.fps * args.factor
    cfg = InterpolationConfig(target_fps=target,
                              compute_dtype=args.dtype)
    interp = FrameInterpolator(cfg)
    interp.setup(meta.height, meta.width)
    factor = interpolation_factor(meta.fps, target)
    out = args.output or Path(args.source).with_name(
        Path(args.source).stem + f"_{int(meta.fps * factor)}fps.y4m")
    writer = open_writer(out, meta.width, meta.height,
                         fps=meta.fps * factor)
    n = 0
    with open_reader(args.source) as r:
        for frame in interp.interpolate_to_fps(iter(r), meta.fps):
            writer.write_frame(frame)
            n += 1
    writer.close()
    print(json.dumps({"output": str(out), "frames": n,
                      "factor": factor,
                      "fps": meta.fps * factor}, indent=2))
    return 0


def cmd_extract_frames(args: argparse.Namespace) -> int:
    """Decode a video to a numbered PNG frame directory (reference
    `framewright extract-frames`)."""
    from framewright_tpu.io import open_reader, probe
    from framewright_tpu.io.png_seq import FrameDirWriter

    meta = probe(args.source)
    w = FrameDirWriter(Path(args.directory), fps=meta.fps)
    n = 0
    with open_reader(args.source) as r:
        for frame in r:
            w.write_frame(frame)
            n += 1
    w.close()
    print(json.dumps({"directory": args.directory, "frames": n,
                      "fps": meta.fps}, indent=2))
    return 0


def cmd_reassemble(args: argparse.Namespace) -> int:
    """Encode a frame directory back to video (reference `framewright
    reassemble`)."""
    from framewright_tpu.io import open_reader, open_writer

    with open_reader(args.directory, fps_hint=args.fps) as r:
        writer = open_writer(args.output, r.width, r.height, fps=args.fps)
        n = 0
        for frame in r:
            writer.write_frame(frame)
            n += 1
        writer.close()
    print(json.dumps({"output": str(args.output), "frames": n}, indent=2))
    return 0


def cmd_compare(args: argparse.Namespace) -> int:
    """Quality comparison of two videos frame-by-frame (reference
    `framewright compare`): PSNR/SSIM/VMAF-proxy."""
    import numpy as np

    from framewright_tpu.io import open_reader
    from framewright_tpu.ops.metrics import psnr_np, ssim_np
    from framewright_tpu.quality.vmaf import VMAFProxy

    scores = {"psnr": [], "ssim": []}
    ref_frames, dis_frames = [], []
    with open_reader(args.reference) as ra, open_reader(args.distorted) as rb:
        for i, (fa, fb) in enumerate(zip(ra, rb)):
            if i % args.sample_every:
                continue
            if fa.shape != fb.shape:
                print(f"error: frame {i} shape mismatch "
                      f"{fa.shape} vs {fb.shape}", file=sys.stderr)
                return 1
            scores["psnr"].append(psnr_np(fa, fb))
            scores["ssim"].append(ssim_np(fa, fb))
            if len(ref_frames) < 32:
                ref_frames.append(fa)
                dis_frames.append(fb)
    if not scores["psnr"]:
        print("error: no comparable frames", file=sys.stderr)
        return 1
    cap = 99.0   # lossless frames report inf; keep the JSON standard
    report = {
        "frames_compared": len(scores["psnr"]),
        "psnr_mean": round(min(float(np.mean(scores["psnr"])), cap), 2),
        "psnr_min": round(min(float(np.min(scores["psnr"])), cap), 2),
        "ssim_mean": round(float(np.mean(scores["ssim"])), 4),
    }
    if ref_frames:
        vr = VMAFProxy().score(np.stack(ref_frames), np.stack(dis_frames))
        report["vmaf_proxy"] = round(vr.score, 2)
    print(json.dumps(report, indent=2))
    return 0


def cmd_upload(args: argparse.Namespace) -> int:
    """Publish a restored video (reference `framewright upload
    youtube|archive`, integration/youtube_upload.py, archive_org.py)."""
    if args.service == "archive":
        from framewright_tpu.uploads import ArchiveMetadata, ArchiveUploader

        up = ArchiveUploader(args.access_key, args.secret_key)
        meta = ArchiveMetadata(
            identifier=args.identifier or Path(args.file).stem,
            title=args.title or Path(args.file).stem,
            description=args.description, creator=args.creator)
        result = up.upload(Path(args.file), meta)
    else:
        from framewright_tpu.uploads import YouTubeMetadata, YouTubeUploader

        up = YouTubeUploader(args.access_token)
        if not up.is_authenticated() and args.refresh_token:
            up.refresh_access_token(args.client_id, args.client_secret,
                                    args.refresh_token)
        result = up.upload(Path(args.file), YouTubeMetadata(
            title=args.title or Path(args.file).stem,
            description=args.description, privacy=args.privacy))
    print(json.dumps({"ok": result.ok, "url": result.url,
                      "error": result.error}, indent=2))
    return 0 if result.ok else 1


def cmd_notify(args: argparse.Namespace) -> int:
    """Send a test notification (reference `framewright notify
    email|sms`, integration/notifications.py)."""
    ok = False
    if args.channel == "email":
        from framewright_tpu.uploads import EmailConfig, EmailSender

        cfg = EmailConfig(smtp_host=args.smtp_host, smtp_port=args.smtp_port,
                          username=args.username, password=args.password,
                          recipients=[args.to])
        ok = EmailSender(cfg).send(args.subject, args.body)
    else:
        from framewright_tpu.uploads import SMSSender

        ok = SMSSender(args.gateway, api_key=args.api_key).send(
            args.to, args.body)
    print(json.dumps({"sent": ok}))
    return 0 if ok else 1


KNOWN_VERBS = {
    "restore", "probe", "check", "presets", "models", "analyze", "bench",
    "warmup", "suite", "recipes", "recipe", "auto", "do", "batch", "watch",
    "qa-report", "export-presets", "audio", "wizard", "farm", "subtitles",
    "interpolate", "extend", "extract-frames", "reassemble", "compare",
    "upload", "notify", "completion", "report", "audio-sync", "proxy",
    # one-word preset verbs (reference cli_simple.py)
    "quick", "best", "archive",
}


def cmd_extend(args: argparse.Namespace) -> int:
    """Extend a clip with synthesized continuation frames (reference
    FrameExtender, processors/restoration/frame_generator.py:880)."""
    from framewright_tpu.io import open_reader, open_writer, probe
    from framewright_tpu.processors.frame_generation import FrameExtender

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    meta = probe(args.source)
    with open_reader(args.source) as r:
        frames = list(r)
    if not frames:
        print("error: empty input", file=sys.stderr)
        return 1
    ext = FrameExtender(flow_backend=args.flow_model)
    before = (ext.extend_backward(frames, args.frames)
              if args.direction in ("backward", "both") else [])
    after = (ext.extend_forward(frames, args.frames)
             if args.direction in ("forward", "both") else [])
    out = args.output or Path(args.source).with_name(
        Path(args.source).stem + "_extended.y4m")
    writer = open_writer(out, meta.width, meta.height, fps=meta.fps)
    for f in [*before, *frames, *after]:
        writer.write_frame(f)
    writer.close()
    print(json.dumps({"output": str(out),
                      "frames": len(before) + len(frames) + len(after),
                      "added_before": len(before),
                      "added_after": len(after)}, indent=2))
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    """Quality trends + job cost estimation (reference `framewright
    report trends|estimate`, reports/trends.py, cost calculator)."""
    if args.report_cmd == "trends":
        from framewright_tpu.reports import QualityTrends

        tr = QualityTrends(Path(args.db))
        print(json.dumps({"summary": tr.summary(),
                          "history": tr.history(limit=args.limit)},
                         indent=2))
        tr.close()
        return 0
    # estimate
    from framewright_tpu.io.video import probe
    from framewright_tpu.models.registry import get_model
    from framewright_tpu.reports import estimate_cost

    meta = probe(args.source)
    family = get_model(args.model).family
    est = estimate_cost(meta.nb_frames, meta.width, meta.height,
                        model_family=family, n_chips=args.chips)
    print(json.dumps(est.to_dict(), indent=2))
    return 0


def cmd_audio_sync(args: argparse.Namespace) -> int:
    """Detect (and optionally fix) A/V offset + drift between two WAV
    tracks (reference `framewright analyze-sync`, audio_sync.py)."""
    from framewright_tpu.audio import (
        AudioSyncAnalyzer,
        AudioSyncCorrector,
        read_wav,
        write_wav,
    )

    ref_audio, sr = read_wav(Path(args.reference))
    test_audio, sr2 = read_wav(Path(args.test))
    if sr != sr2:
        print(f"error: sample-rate mismatch {sr} vs {sr2}", file=sys.stderr)
        return 1
    rep = AudioSyncAnalyzer().analyze(ref_audio, test_audio, sr)
    out = {"offset_s": round(rep["offset_s"], 4),
           "drift_s_per_s": round(rep["drift_s_per_s"], 6),
           "windows": rep["points"]}
    if args.fix:
        fixed = AudioSyncCorrector.correct(
            test_audio, sr, offset_s=rep["offset_s"],
            drift_s_per_s=rep["drift_s_per_s"])
        write_wav(Path(args.fix), fixed, sr)
        out["fixed"] = args.fix
    print(json.dumps(out, indent=2))
    return 0


def cmd_proxy(args: argparse.Namespace) -> int:
    """Proxy workflow (reference `framewright proxy create|apply`):
    cut a low-res proxy for fast preview/grading, then apply the same
    settings to the full-res source."""
    from framewright_tpu.io import open_reader, open_writer, probe

    if args.proxy_cmd == "create":
        import numpy as np

        meta = probe(args.source)
        ph = args.height
        pw = max(2, round(meta.width * ph / meta.height / 2) * 2)
        out = Path(args.output) if args.output else \
            Path(args.source).with_name(Path(args.source).stem + "_proxy.y4m")
        writer = open_writer(out, pw, ph, fps=meta.fps)
        n = 0
        ys = np.linspace(0, meta.height - 1, ph).astype(np.int32)
        xs = np.linspace(0, meta.width - 1, pw).astype(np.int32)
        with open_reader(args.source) as r:
            for frame in r:
                writer.write_frame(frame[ys][:, xs])
                n += 1
        writer.close()
        sidecar = out.with_suffix(".proxy.json")
        sidecar.write_text(json.dumps({
            "source": str(Path(args.source).resolve()),
            "proxy": str(out), "height": ph, "frames": n}))
        print(json.dumps({"proxy": str(out), "frames": n,
                          "sidecar": str(sidecar)}, indent=2))
        return 0
    # apply: run the restore config against the ORIGINAL source
    sidecar = Path(args.proxy).with_suffix(".proxy.json")
    if not sidecar.exists():
        print(f"error: no proxy sidecar {sidecar}", file=sys.stderr)
        return 1
    info = json.loads(sidecar.read_text())
    args.source = info["source"]
    return cmd_restore(args)

_COMPLETION_BASH = """\
_framewright() {
  local cur prev verbs
  COMPREPLY=()
  cur="${COMP_WORDS[COMP_CWORD]}"
  verbs="%s"
  if [ "$COMP_CWORD" -eq 1 ]; then
    COMPREPLY=( $(compgen -W "$verbs" -- "$cur") )
  else
    COMPREPLY=( $(compgen -f -- "$cur") )
  fi
}
complete -F _framewright framewright
"""


def cmd_completion(args: argparse.Namespace) -> int:
    """Emit a bash completion script (reference `framewright
    completion`)."""
    print(_COMPLETION_BASH % " ".join(sorted(KNOWN_VERBS)))
    return 0


def cmd_subtitles(args: argparse.Namespace) -> int:
    """Extract hardcoded subtitle events (+text when OCR is available)
    to SRT (reference subtitle_extraction.py surface)."""
    from framewright_tpu.io import open_reader, probe
    from framewright_tpu.processors.ocr import default_ocr_fn
    from framewright_tpu.processors.subtitles import (
        SubtitleTimingExtractor,
        export_srt,
    )

    meta = probe(args.source)
    if args.sync or args.enhance:
        # retime/clean an existing SRT instead of extracting
        from framewright_tpu.processors.subtitles import (
            SubtitleEnhancer,
            SubtitleTimeSync,
            format_srt,
            parse_srt,
        )

        srt_path = Path(args.sync or args.enhance)
        track = parse_srt(srt_path.read_text())
        if args.sync:
            ext = SubtitleTimingExtractor(region=args.region)
            with open_reader(args.source) as r:
                events = ext.analyze(iter(r))
            track = SubtitleTimeSync.sync_to_events(track, events, meta.fps)
        if args.enhance:
            track = SubtitleEnhancer.enhance(track, scale=args.scale)
        out = Path(args.output) if args.output else \
            srt_path.with_suffix(".synced.srt")
        out.write_text(format_srt(track))
        print(f"{len(track.lines)} lines -> {out}")
        return 0
    ocr_fn = None if args.no_ocr else default_ocr_fn(lang=args.lang)
    if ocr_fn is None and not args.no_ocr:
        print("note: no OCR backend (tesseract) found; SRT will carry "
              "timing only", file=sys.stderr)
    ext = SubtitleTimingExtractor(ocr_fn=ocr_fn, region=args.region)
    with open_reader(args.source) as r:
        events = ext.analyze(iter(r))
    out = Path(args.output) if args.output else \
        Path(args.source).with_suffix(".srt")
    out.write_text(export_srt(events, meta.fps))
    print(f"{len(events)} subtitle events -> {out}")
    return 0


def cmd_audio(args: argparse.Namespace) -> int:
    from framewright_tpu.audio import AudioEnhanceConfig, AudioEnhancer

    if args.separate:
        from framewright_tpu.audio_separation import (
            AudioSeparator,
            SeparationConfig,
        )

        paths = AudioSeparator(SeparationConfig()).separate_file(
            Path(args.source), Path(args.separate))
        for name, p in paths.items():
            print(f"{name}: {p}")
        return 0
    if args.output is None:
        print("error: output path required (or use --separate DIR)",
              file=sys.stderr)
        return 1
    if args.dialog:
        from framewright_tpu.audio_separation import DialogEnhancer

        out = DialogEnhancer().process_file(Path(args.source),
                                            Path(args.output))
        print(str(out))
        return 0
    cfg = AudioEnhanceConfig(
        denoise=not args.no_denoise,
        denoise_model=args.denoise_model,
        hum_removal=not args.no_hum,
        click_removal=not args.no_clicks,
        normalize=not args.no_normalize,
        hum_freq=args.hum_freq,
    )
    out = AudioEnhancer(cfg).process_file(Path(args.source), Path(args.output))
    print(str(out))
    return 0


def cmd_farm(args: argparse.Namespace) -> int:
    """Distributed render farm / cloud burst over a shared directory."""
    from framewright_tpu.parallel.multihost import (
        RenderJob,
        SharedDirCoordinator,
        run_coordinator,
        run_worker,
    )

    if args.device != "auto":
        import jax

        jax.config.update("jax_platforms", args.device)
    work_dir = Path(args.work_dir)
    if args.farm_cmd == "work":
        done = run_worker(work_dir, worker_id=args.worker_id or None)
        print(json.dumps({"worker_chunks_done": done}))
        return 0
    if args.farm_cmd == "status":
        coord = SharedDirCoordinator(work_dir)
        job = coord.load_job()
        status = coord.chunk_status(len(job.chunks()))
        print(json.dumps({
            "chunks": status, "workers": coord.live_workers(),
            "complete": coord.is_complete(len(job.chunks())),
        }, indent=2))
        return 0
    # farm run: coordinate (optionally bursting to a cloud provider)
    from framewright_tpu.io.video import probe

    meta = probe(Path(args.source))
    config = {
        "sr_model": args.model, "compute_dtype": args.dtype,
        "scale_factor": args.scale,
    }
    job = RenderJob(
        job_id=args.job_id, source=str(Path(args.source).resolve()),
        output=str(work_dir / "merged.y4m"), config=config,
        total_frames=meta.nb_frames, chunk_frames=args.chunk_frames,
    )
    if args.burst != "none":
        from framewright_tpu.cloud import (
            PROVIDERS,
            BurstPolicy,
            CloudBurstManager,
            InstanceSpec,
            LocalDirStorage,
        )

        provider_cls = PROVIDERS[args.burst]
        provider = (provider_cls(job_dir=work_dir) if args.burst == "local"
                    else provider_cls(api_key=args.api_key))
        mgr = CloudBurstManager(
            provider, LocalDirStorage(work_dir),
            BurstPolicy(max_instances=args.workers))
        out = mgr.run(Path(args.source), Path(args.output), meta.nb_frames,
                      config=config, spec=InstanceSpec(),
                      chunk_frames=args.chunk_frames, timeout=args.timeout)
    else:
        out = run_coordinator(work_dir, job, timeout=args.timeout)
        import shutil as _sh

        _sh.copyfile(out, args.output)
        out = args.output
    print(json.dumps({"output": str(out)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="framewright",
        description="TPU-native video restoration (framewright-tpu)",
    )
    parser.add_argument("--version", action="version", version=__version__)
    sub = parser.add_subparsers(dest="command")

    p = sub.add_parser("restore", help="restore a video (default command)")
    _add_restore_args(p)
    p.set_defaults(func=cmd_restore)

    # one-word verbs (reference cli_simple.py:174-760: quick/best/
    # archive with zero flags): plain `restore` with a pinned preset —
    # `framewright quick video.y4m` just works
    for word, preset_name, blurb in (
        ("quick", "fast", "fast 2x upscale"),
        ("best", "ultimate", "maximum quality, every stage on"),
        ("archive", "archive", "film-archive restoration defaults"),
    ):
        p = sub.add_parser(word,
                           help=f"one-word restore ({blurb})")
        _add_restore_args(p)
        p.set_defaults(func=cmd_restore, preset=preset_name)

    p = sub.add_parser("probe", help="show video metadata")
    p.add_argument("source")
    p.set_defaults(func=cmd_probe)

    p = sub.add_parser("check", help="hardware report")
    p.set_defaults(func=cmd_check)

    p = sub.add_parser("presets", help="list presets")
    p.set_defaults(func=cmd_presets)

    p = sub.add_parser("models",
                       help="model zoo: list/guide/port/download/verify")
    p.add_argument("action", nargs="?",
                   choices=["list", "guide", "port", "download", "verify"],
                   default="list")
    p.add_argument("name", nargs="?", default="")
    p.add_argument("--path", default="",
                   help="explicit .pth path for port/verify")
    p.add_argument("--verbose", "-v", action="store_true")
    p.set_defaults(func=cmd_models)

    p = sub.add_parser("analyze", help="content analysis (dedup/scenes)")
    p.add_argument("source")
    p.add_argument("--intelligence", action="store_true",
                   help="per-scene content map + adaptive settings")
    p.set_defaults(func=cmd_analyze)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser("warmup",
                       help="precompile the SR program for a geometry "
                            "into the persistent XLA cache")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--output-color", default="yuv420",
                   choices=["yuv420", "rgb"],
                   help="production writer path to compile "
                        "(yuv420 = straight-to-Y4M fast path)")
    p.add_argument("--batches", default="",
                   help="comma-separated frame-batch sizes "
                        "(default: planner batch + 1)")
    _add_restore_args(p, with_source=False)
    p.set_defaults(func=cmd_warmup)

    p = sub.add_parser("suite", help="run the standard benchmark suite")
    p.add_argument("--work-dir", default="./framewright_bench")
    p.add_argument("--iterations", type=int, default=3)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--output", default="")
    p.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    p.set_defaults(func=cmd_suite)

    p = sub.add_parser("recipes", help="list restoration recipes")
    p.set_defaults(func=cmd_recipes)

    p = sub.add_parser("recipe", help="run a named recipe")
    p.add_argument("name")
    p.add_argument("source")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--project-dir", default="./framewright_project")
    p.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    p.set_defaults(func=cmd_recipe)

    p = sub.add_parser("auto", help="analyze content and auto-restore")
    p.add_argument("source")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--project-dir", default="./framewright_project")
    p.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    p.set_defaults(func=cmd_auto)

    p = sub.add_parser("do", help='natural-language command: do "restore my vhs tape.mp4"')
    p.add_argument("text")
    p.add_argument("--source", default="")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--project-dir", default="./framewright_project")
    p.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    p.add_argument("--dry-run", action="store_true")
    p.set_defaults(func=cmd_do)

    p = sub.add_parser("batch", help="batch queue: submit/list/run")
    p.add_argument("action", choices=["submit", "list", "run"])
    p.add_argument("source", nargs="?", default="")
    p.add_argument("-o", "--output", default="")
    p.add_argument("--db", default="./framewright_jobs.db")
    p.set_defaults(func=cmd_batch)

    p = sub.add_parser("watch", help="watch a folder and restore new videos")
    p.add_argument("directory")
    p.add_argument("--output-dir", default="")
    p.add_argument("--db", default="./framewright_jobs.db")
    p.add_argument("--poll", type=float, default=2.0)
    p.add_argument("--cycles", type=int, default=None)
    p.set_defaults(func=cmd_watch)

    p = sub.add_parser("qa-report", help="write a QA report skeleton")
    p.add_argument("source")
    p.add_argument("--output", default="")
    p.add_argument("--report", default="qa_report.html")
    p.set_defaults(func=cmd_qa_report)

    p = sub.add_parser("export-presets", help="list encode/export presets")
    p.set_defaults(func=cmd_export_presets)

    p = sub.add_parser("wizard", help="interactive setup wizard")
    p.add_argument("source", nargs="?", default="")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--project-dir", default="./framewright_project")
    p.add_argument("--save-profile", default="")
    p.set_defaults(func=cmd_wizard)

    p = sub.add_parser("farm", help="distributed render farm / cloud burst")
    fsub = p.add_subparsers(dest="farm_cmd", required=True)
    fw = fsub.add_parser("work", help="run a worker against a shared job dir")
    fw.add_argument("work_dir")
    fw.add_argument("--worker-id", default="")
    fw.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    fs = fsub.add_parser("status", help="show chunk/worker status")
    fs.add_argument("work_dir")
    fs.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    fr = fsub.add_parser("run", help="coordinate a farm/burst job")
    fr.add_argument("source")
    fr.add_argument("work_dir")
    fr.add_argument("-o", "--output", required=True)
    fr.add_argument("--model", default="realesr-animevideov3")
    fr.add_argument("--dtype", default="bfloat16")
    fr.add_argument("--scale", type=int, default=4)
    fr.add_argument("--chunk-frames", type=int, default=100)
    fr.add_argument("--job-id", default="farm")
    fr.add_argument("--burst", default="none",
                    choices=["none", "local", "runpod", "vastai", "gcp-tpu"])
    fr.add_argument("--api-key", default="")
    fr.add_argument("--workers", type=int, default=2)
    fr.add_argument("--timeout", type=float, default=86400.0)
    fr.add_argument("--device", choices=["auto", "tpu", "cpu"], default="auto")
    p.set_defaults(func=cmd_farm)

    p = sub.add_parser("subtitles",
                       help="extract hardcoded subtitles to .srt (OCR "
                            "when tesseract is installed; timing always)")
    p.add_argument("source")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--lang", default="eng")
    p.add_argument("--region", choices=["bottom", "top", "full"],
                   default="bottom", help="where on the frame subtitles live")
    p.add_argument("--no-ocr", action="store_true",
                   help="timing-only SRT (skip text recognition)")
    p.add_argument("--sync", metavar="SRT", default=None,
                   help="retime an existing SRT against detected "
                        "on-screen events (drift/offset correction)")
    p.add_argument("--enhance", metavar="SRT", default=None,
                   help="clean OCR artifacts + standardize formatting "
                        "of an existing SRT")
    p.add_argument("--scale", type=float, default=1.0,
                   help="position scale factor for --enhance")
    p.set_defaults(func=cmd_subtitles)

    p = sub.add_parser("interpolate", help="standalone frame interpolation")
    p.add_argument("source")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--factor", type=int, default=2,
                   help="multiply fps by this (ignored with --target-fps)")
    p.add_argument("--target-fps", dest="target_fps", type=float, default=0.0)
    p.add_argument("--dtype", default="float32",
                   choices=["bfloat16", "float32"])
    p.add_argument("--device", choices=["auto", "tpu", "cpu"],
                   default="auto")
    p.set_defaults(func=cmd_interpolate)

    p = sub.add_parser("extend",
                       help="extend a clip forward/backward by motion "
                            "extrapolation")
    p.add_argument("source")
    p.add_argument("-o", "--output", type=Path, default=None)
    p.add_argument("--frames", type=int, default=24,
                   help="number of frames to synthesize")
    p.add_argument("--direction", choices=["forward", "backward", "both"],
                   default="forward")
    p.add_argument("--flow-model", dest="flow_model", default="ifnet",
                   choices=["ifnet", "raft"])
    p.add_argument("--device", choices=["auto", "tpu", "cpu"],
                   default="auto")
    p.set_defaults(func=cmd_extend)

    p = sub.add_parser("extract-frames",
                       help="decode a video to a PNG frame directory")
    p.add_argument("source")
    p.add_argument("directory")
    p.set_defaults(func=cmd_extract_frames)

    p = sub.add_parser("reassemble",
                       help="encode a frame directory back to video")
    p.add_argument("directory")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--fps", type=float, default=25.0)
    p.set_defaults(func=cmd_reassemble)

    p = sub.add_parser("compare",
                       help="frame-by-frame quality comparison of two videos")
    p.add_argument("reference")
    p.add_argument("distorted")
    p.add_argument("--sample-every", type=int, default=1)
    p.set_defaults(func=cmd_compare)

    p = sub.add_parser("upload", help="publish to YouTube / archive.org")
    p.add_argument("service", choices=["youtube", "archive"])
    p.add_argument("file")
    p.add_argument("--title", default="")
    p.add_argument("--description", default="")
    p.add_argument("--creator", default="")
    p.add_argument("--identifier", default="", help="archive.org item id")
    p.add_argument("--access-key", default="", help="archive.org IAS3 key")
    p.add_argument("--secret-key", default="", help="archive.org IAS3 secret")
    p.add_argument("--access-token", default="", help="YouTube OAuth2 token")
    p.add_argument("--client-id", default="")
    p.add_argument("--client-secret", default="")
    p.add_argument("--refresh-token", default="")
    p.add_argument("--privacy", default="private",
                   choices=["private", "unlisted", "public"])
    p.set_defaults(func=cmd_upload)

    p = sub.add_parser("notify", help="send a test notification")
    p.add_argument("channel", choices=["email", "sms"])
    p.add_argument("--to", required=True)
    p.add_argument("--subject", default="[framewright] test")
    p.add_argument("--body", default="notification test")
    p.add_argument("--smtp-host", default="localhost")
    p.add_argument("--smtp-port", type=int, default=587)
    p.add_argument("--username", default="")
    p.add_argument("--password", default="")
    p.add_argument("--gateway", default="", help="SMS gateway webhook URL")
    p.add_argument("--api-key", default="")
    p.set_defaults(func=cmd_notify)

    p = sub.add_parser("completion", help="print a bash completion script")
    p.set_defaults(func=cmd_completion)

    p = sub.add_parser("report", help="quality trends / job cost estimate")
    rsub = p.add_subparsers(dest="report_cmd", required=True)
    rt = rsub.add_parser("trends", help="quality-over-time history")
    rt.add_argument("--db", default="./framewright_trends.db")
    rt.add_argument("--limit", type=int, default=20)
    re_ = rsub.add_parser("estimate", help="wall-time + cost estimate")
    re_.add_argument("source")
    re_.add_argument("--model", default="RealESRGAN_x2plus")
    re_.add_argument("--chips", type=int, default=1)
    p.set_defaults(func=cmd_report)

    p = sub.add_parser("audio-sync",
                       help="detect/fix offset + drift between WAV tracks")
    p.add_argument("reference")
    p.add_argument("test")
    p.add_argument("--fix", default="", help="write corrected WAV here")
    p.set_defaults(func=cmd_audio_sync)

    p = sub.add_parser("proxy", help="low-res proxy workflow")
    psub = p.add_subparsers(dest="proxy_cmd", required=True)
    pc = psub.add_parser("create", help="cut a low-res proxy + sidecar")
    pc.add_argument("source")
    pc.add_argument("-o", "--output", default="")
    pc.add_argument("--height", type=int, default=360)
    pa = psub.add_parser("apply",
                         help="restore the ORIGINAL source of a proxy")
    pa.add_argument("proxy")
    _add_restore_args(pa, with_source=False)
    p.set_defaults(func=cmd_proxy)

    p = sub.add_parser("audio", help="enhance a WAV audio file")
    p.add_argument("source")
    p.add_argument("output", nargs="?", default=None)
    p.add_argument("--separate", metavar="DIR", default=None,
                   help="split into vocals/background stems (learned "
                        "band-mask + REPET/modulation separator)")
    p.add_argument("--dialog", action="store_true",
                   help="speech clarity chain: presence EQ, de-ess, "
                        "compressor, limiter")
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--denoise-model", default="ai",
                   choices=["ai", "wiener", "spectral"],
                   help="ai = learned mask net (DeepFilterNet-class, "
                        "packaged checkpoint; falls back to wiener)")
    p.add_argument("--no-hum", action="store_true")
    p.add_argument("--no-clicks", action="store_true")
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--hum-freq", type=float, default=50.0)
    p.set_defaults(func=cmd_audio)

    return parser


def main_check(argv: Optional[List[str]] = None) -> int:
    """framewright-check entry point."""
    return main(["check"])


def main_bench(argv: Optional[List[str]] = None) -> int:
    """framewright-bench entry point."""
    return main(["bench"])


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # `framewright video.mp4` sugar: treat a path-like first arg as restore
    known = KNOWN_VERBS | {"-h", "--help", "--version"}
    if argv and argv[0] not in known and not argv[0].startswith("-"):
        argv = ["restore"] + argv
    parser = build_parser()
    args = parser.parse_args(argv)
    if not getattr(args, "command", None):
        parser.print_help()
        return 0
    try:
        return args.func(args)
    except FramewrightError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    except BrokenPipeError:
        # stdout consumer (| head, | less q) went away — not an error
        try:
            sys.stdout.close()
        except Exception:  # noqa: BLE001
            pass
        return 0


if __name__ == "__main__":
    sys.exit(main())
