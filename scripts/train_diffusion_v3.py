#!/usr/bin/env python
"""Round-4 diffusion-SR quality push, take 2 (VERDICT item 6).

The v2 recipe (wider base_ch=48 net trained from scratch) was behind
the shipped checkpoint after its budget (min-margin 0.11 vs shipped
0.58) AND would have promoted an arch-incompatible npz (registry
arch_config stays base_ch=32). v3 instead CONTINUES the shipped
base_ch=32 / steps=2 checkpoint with the end-to-end sampler fine-tune
in time-budgeted chunks: same arch as the registry entry, so every
improvement is directly shippable, and no pre-train time is spent.

Progress is checkpointed to /tmp/diff_v3_best.npz after every chunk
that improves the min-margin across the 4 held-out eval seeds; the
packaged checkpoint is replaced only when the min-margin beats the
shipped baseline measured at startup (in this process, same eval).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/train_diffusion_v3.py [budget_minutes] [--resume]
"""

import sys
import time
from pathlib import Path

BEST = Path("/tmp/diff_v3_best.npz")


def evaluate(apply_fn_params, cfg, seeds=(123, 7, 99, 2024), n=32):
    from framewright_tpu.models import diffusion_sr, distill

    margins = []
    for seed in seeds:
        m, b = distill.eval_psnr(
            lambda lr: diffusion_sr.apply(apply_fn_params, lr, cfg),
            cfg.scale, n=n, hr_size=64, seed=seed)
        margins.append(m - b)
    return margins


def main():
    import shutil

    import jax

    from framewright_tpu.models import distill, registry, torch_port

    budget_min = 75.0
    resume = False
    for a in sys.argv[1:]:
        if a == "--resume":
            resume = True
        else:
            budget_min = float(a)
    print("platform:", jax.devices()[0].platform,
          "budget:", budget_min, "min", "resume:", resume, flush=True)
    deadline = time.time() + budget_min * 60

    spec, params = registry.init_model("DiffusionSR_x4",
                                       allow_random=False)
    cfg = spec.arch_config
    baseline = evaluate(params, cfg)
    best = min(baseline)
    print("shipped margins:", [round(m, 3) for m in baseline],
          "min:", round(best, 3), flush=True)
    if resume and BEST.exists():
        params = torch_port.import_npz(BEST)
        margins = evaluate(params, cfg)
        print("resumed margins:", [round(m, 3) for m in margins],
              flush=True)
        best = max(best, min(margins))

    chunk = 600
    lr = 6e-5  # the shipped ckpt already did a 1e-4 schedule
    improved = False
    while time.time() < deadline:
        t0 = time.time()
        params = distill.finetune_sampler(
            cfg=cfg, steps=chunk, batch=8, hr_size=96, lr=lr,
            params=params, pool_size=2048, pool_refresh=300,
            seed=int(time.time()) % 100000)
        margins = evaluate(params, cfg)
        print(f"finetune +{chunk} ({time.time()-t0:.0f}s) lr={lr:.1e};"
              " margins:", [round(m, 3) for m in margins], flush=True)
        if min(margins) > best:
            best = min(margins)
            distill.save_npz(params, BEST)
            improved = True
            print(f"  new best min-margin {best:.3f} -> {BEST}",
                  flush=True)
        lr *= 0.85

    if improved:
        out = registry.packaged_weights_dir() / "DiffusionSR_x4.npz"
        shutil.copy(BEST, out)
        print(f"promoted {BEST} -> {out} (min margin {best:.3f})",
              flush=True)
    else:
        print("no improvement over shipped; packaged ckpt unchanged",
              flush=True)


if __name__ == "__main__":
    main()
