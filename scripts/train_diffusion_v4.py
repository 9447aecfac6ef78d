#!/usr/bin/env python
"""Round-5 diffusion-SR quality push: 1-step sampler distillation
(VERDICT r4 next-step 6 — "change the training recipe, not the budget").

Two rounds of more-of-the-same (v2 wider-from-scratch, v3 budgeted
2-step sampler fine-tune) left the margin at +0.6 dB over bicubic. The
capped quantity is the 2-step sampler's stochasticity: the final output
is the x0 prediction at t≈T/2, whose input still carries half the
noise — a PSNR penalty no amount of same-recipe training removes.

v4 distills the sampler to ONE step (consistency/progressive-
distillation family): fine-tune THROUGH the steps=1 DDIM unroll, so the
composed net becomes a noise-draw-invariant regressor conditioned on
the bicubic upsample — the PSNR-optimal configuration this machinery
admits. Starting point: the shipped steps=2 checkpoint (same arch,
base_ch=32, so every improvement is shippable); raw steps=1 margin at
startup is ~-2.6 dB, the fine-tune must first re-target t=T-1 then
beat the +0.6 dB shipped margin.

Chunked + checkpointed like v3: /tmp/diff_v4_best.npz after each
improving chunk; the packaged checkpoint and the registry steps= entry
are only touched when the min-margin across the 4 held-out seeds beats
the shipped baseline measured at startup.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/train_diffusion_v4.py [budget_minutes] [--resume]
"""

import dataclasses
import sys
import time
from pathlib import Path

BEST = Path("/tmp/diff_v4_best.npz")
SEEDS = (123, 7, 99, 2024)


def evaluate(params, cfg, n=32):
    from framewright_tpu.models import diffusion_sr, distill

    margins = []
    for seed in SEEDS:
        m, b = distill.eval_psnr(
            lambda lr: diffusion_sr.apply(params, lr, cfg),
            cfg.scale, n=n, hr_size=64, seed=seed)
        margins.append(m - b)
    return margins


def main():
    import shutil

    import numpy as np

    from framewright_tpu.models import distill, registry, torch_port

    budget_min = 75.0
    resume = False
    for a in sys.argv[1:]:
        if a == "--resume":
            resume = True
        else:
            budget_min = float(a)
    t_end = time.time() + budget_min * 60.0

    spec, params = registry.init_model("DiffusionSR_x4", allow_random=False)
    cfg2 = spec.arch_config                       # shipped steps (baseline)
    cfg1 = dataclasses.replace(cfg2, steps=1)     # distillation target

    base = evaluate(params, cfg2)
    print(f"shipped baseline (steps={cfg2.steps}): "
          f"{['%.3f' % m for m in base]} min {min(base):.3f}", flush=True)
    target = min(base)

    if resume and BEST.exists():
        params = torch_port.import_npz(BEST)
        print(f"resumed from {BEST}", flush=True)

    best = evaluate(params, cfg1)
    best_min = min(best)
    print(f"start (steps=1): {['%.3f' % m for m in best]}", flush=True)

    chunk_steps = 1500
    chunk_i = 0
    while time.time() < t_end:
        chunk_i += 1
        lr = 1e-4 if chunk_i <= 2 else 5e-5
        params_new = distill.finetune_sampler(
            cfg=cfg1, steps=chunk_steps, batch=8, hr_size=64, lr=lr,
            seed=chunk_i, log_every=500, params=params,
            pool_size=4096, pool_refresh=500)
        margins = evaluate(params_new, cfg1)
        print(f"chunk {chunk_i}: {['%.3f' % m for m in margins]} "
              f"min {min(margins):.3f} (best {best_min:.3f}, "
              f"shipped {target:.3f})", flush=True)
        params = params_new               # continue from the latest
        if min(margins) > best_min:
            best_min = min(margins)
            distill.save_npz(params, BEST)
            print(f"  -> new best saved ({best_min:.3f})", flush=True)

    if best_min > target and BEST.exists():
        dst = registry.packaged_weights_dir() / "DiffusionSR_x4.npz"
        shutil.copy(BEST, dst)
        print(f"PROMOTED: steps=1 min-margin {best_min:.3f} beats shipped "
              f"{target:.3f} -> {dst}\n"
              "NOW UPDATE registry: DiffusionSR_x4 arch_config steps=1",
              flush=True)
    else:
        print(f"kept shipped checkpoint (steps=1 best {best_min:.3f} "
              f"vs shipped {target:.3f})", flush=True)


if __name__ == "__main__":
    main()
