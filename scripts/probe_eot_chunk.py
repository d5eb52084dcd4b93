#!/usr/bin/env python
"""In-program sweep of (eot_chunk, remat_policy) for the diffusion PGD step.

Round-2 measured eot_chunk=2 *slower* under remat_policy="none" (3.20
s/step — batching reps doubles live activations and XLA's schedule
degrades) and noted "the chunk knob only paid when it amortized recompute
under heavier remat policies" — but never measured chunk>1 under "full" or
"dots" after "none" became the default.  This probe closes that gap: same
reference L2 config as scripts/probe_attn_impl.py (10 EOT reps × K=4 LCM
chain × CFG at 512², the hot loop of /root/reference/main.py:79-102).

Usage: python scripts/probe_eot_chunk.py [--variants 1:none 2:full 5:full]
       [--steps 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from bench import free_all_device_memory  # the one HBM-reclaim impl (bench.py)
# reliable completion-wait: block_until_ready is a no-op on the async
# axon plugin; only host value fetches wait (docs/PERF.md measurement gotchas)
from tml_image_editing_defense_tpu.utils.profiling import sync as _sync
from tml_image_editing_defense_tpu.utils.profiling import measure_key as _mkey


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(chunk: int, remat: str, n_meas: int) -> float:
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    tag = f"chunk{chunk}:{remat}"
    dtype = jnp.bfloat16
    t0 = time.time()
    model = build_model("sd15", key=jax.random.key(0), dtype=dtype,
                        fast_init=True, attn_kv_chunk=512)
    log(f"[{tag}] built model in {time.time() - t0:.1f}s")
    key = jax.random.key(1)
    src = jnp.clip(jax.random.normal(key, (1, 512, 512, 3), jnp.float32) * 0.4,
                   -1, 1).astype(dtype)
    cfg = TrainConfig(
        norm_type="l2", n_denoising_steps_per_iteration=4,
        limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
        image_size=512, dtype="bfloat16", eot_mode="scan",
        eot_chunk=chunk, remat_policy=remat,
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration, limit_t=700)
    bank = model.embed_prompt_bank([p + ", detailed" for p in cfg.prompts[:8]])
    pool = make_noise_pool(jax.random.key(2), cfg.n_noise, model.latent_shape, dtype)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    t0 = time.time()
    x, aux = step(model.params, src, data, _mkey(3))
    _sync(x)
    log(f"[{tag}] compile+first-run {time.time() - t0:.1f}s "
        f"(loss {float(aux['avg_loss']):.1f})")
    ts = []
    for i in range(n_meas):
        t0 = time.time()
        x, aux = step(model.params, x, data, _mkey(100 + i))
        _sync(x)
        ts.append(time.time() - t0)
    log(f"[{tag}] steps: {['%.3f' % t for t in ts]}")
    del model, data, step, x, aux, pool, bank
    free_all_device_memory()
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["2:full", "5:full", "2:dots"])
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    results = {}
    for v in args.variants:
        c, r = v.split(":")
        try:
            results[v] = round(measure(int(c), r, args.steps), 3)
        except Exception as e:
            log(f"[{v}] FAILED {type(e).__name__}: {str(e)[:400]}")
            results[v] = "error"
    print(results)


if __name__ == "__main__":
    main()
