#!/usr/bin/env python
"""Round-4 diffusion-SR quality push (VERDICT item 6).

Recipe: wider UNet (base_ch 48) + larger training patches (96) +
x0 pre-train with sampler-grid t-bias, then an end-to-end fine-tune
through the 2-step DDIM unroll in TIME-BUDGETED chunks with periodic
eval; the best-margin params are checkpointed after every chunk
(/tmp/diff_v2_best.npz) so progress survives interruption. The
packaged checkpoint is replaced only if min-margin across 4 held-out
seeds beats the shipped +0.58.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_diffusion_v2.py [budget_minutes]
"""

import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

BEST = Path("/tmp/diff_v2_best.npz")


def evaluate(params, cfg, seeds=(123, 7, 99, 2024), n=32):
    from framewright_tpu.models import diffusion_sr, distill

    margins = []
    for seed in seeds:
        m, b = distill.eval_psnr(
            lambda lr: diffusion_sr.apply(params, lr, cfg),
            cfg.scale, n=n, hr_size=64, seed=seed)
        margins.append(m - b)
    return margins


def main():
    import jax

    from framewright_tpu.models import diffusion_sr, distill, registry

    budget_min = float(sys.argv[1]) if len(sys.argv) > 1 else 75.0
    print("platform:", jax.devices()[0].platform,
          "budget:", budget_min, "min", flush=True)
    cfg = dataclasses.replace(diffusion_sr.DiffusionSRConfig(),
                              base_ch=48, steps=2)
    deadline = time.time() + budget_min * 60

    t0 = time.time()
    params = distill.train_diffusion(
        cfg=cfg, steps=2500, batch=8, hr_size=96, lr=3e-4,
        t_bias=0.7, pool_size=4096, pool_refresh=500, log_every=500)
    margins = evaluate(params, cfg)
    print(f"x0 pre-train done ({time.time()-t0:.0f}s); margins:",
          [round(m, 3) for m in margins], flush=True)
    best = min(margins)
    distill.save_npz(params, BEST)

    chunk = 600
    lr = 1e-4
    while time.time() < deadline:
        t0 = time.time()
        params = distill.finetune_sampler(
            cfg=cfg, steps=chunk, batch=8, hr_size=96, lr=lr,
            params=params, pool_size=2048, pool_refresh=300)
        margins = evaluate(params, cfg)
        print(f"finetune +{chunk} ({time.time()-t0:.0f}s); margins:",
              [round(m, 3) for m in margins], flush=True)
        if min(margins) > best:
            best = min(margins)
            distill.save_npz(params, BEST)
            print(f"  new best min-margin {best:.3f} -> {BEST}", flush=True)
        lr *= 0.8

    out = registry.packaged_weights_dir() / "DiffusionSR_x4.npz"
    if best > 0.9:
        import shutil

        shutil.copy(BEST, out)
        print(f"saved {out} (min margin {best:.3f})")
    else:
        print(f"kept at {BEST} (min margin {best:.3f} <= 0.9; "
              f"shipped checkpoint unchanged)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
