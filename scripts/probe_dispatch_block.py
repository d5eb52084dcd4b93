"""Sustained host-driven immunize throughput vs ``dispatch_block``
(VERDICT r4 item 1b/1c).

Round 4 measured the 200-step sd15 rehearsal at 2.43-2.61 s/step against a
1.66 s/step bench minimum and found ``dispatch_block=25`` *worse* (3.05)
— but the blocked scan then carried the decoded [1,512,512,3] vis image in
its carry, and block sizes between 1 and 25 were never tried.  This probe
re-sweeps block ∈ {1, 2, 5, 10, 25} with the round-5 image-free aux carry
(attack/pgd.py decode_vis=False hot path) on the exact product loop
(``run_pgd``, reference outer loop main.py:79-142).

Each leg drives N=50 host-side iterations twice and reports the second
run's wall/steps (first run absorbs the block program's compile).  Keys are
salted with process entropy (axon server-side execution cache).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dispatch_block.py
CPU smoke: PROBE_FAMILY=tiny PROBE_STEPS=6 TID_FORCE_CPU=1 \
           PYTHONPATH=/root/repo python scripts/probe_dispatch_block.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

if os.environ.get("TID_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tml_image_editing_defense_tpu.attack import make_attack_data
    from tml_image_editing_defense_tpu.attack.pgd import run_pgd
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    family = os.environ.get("PROBE_FAMILY", "sd15")
    n_steps = int(os.environ.get("PROBE_STEPS", "50"))
    blocks = [int(b) for b in os.environ.get("PROBE_BLOCKS", "1,2,5,10,25").split(",")]
    dev = jax.devices()[0]
    log(f"device: {dev}")
    tiny = family.startswith("tiny")
    dtype = jnp.float32 if tiny else jnp.bfloat16
    size = 32 if tiny else 512

    t0 = time.time()
    model = build_model(family, key=jax.random.key(0), dtype=dtype,
                        fast_init=not tiny,
                        attn_kv_chunk=None if tiny else 512)
    log(f"built {family} in {time.time() - t0:.1f}s")

    # the round-4 rehearsal's config: reference L2 defaults (reps 10,
    # LCM K=4 → 2 effective under t<700), bf16, scan EOT
    cfg = TrainConfig(
        norm_type="l2",
        n_optimization_steps=n_steps,
        n_denoising_steps_per_iteration=4 if not tiny else 2,
        limit_timesteps=not tiny,
        guidance_scale=4.0,
        use_lcm=True,
        image_size=size,
        dtype=str(jnp.dtype(dtype)),
        eot_mode="scan",
        remat_policy="none",
        prompts=list(PROMPTS_LIST),
        enable_visualization=False,
        **({"derive_norm_hyperparams": False, "eps": 8.0, "step_size": 1.0,
            "grad_reps": 2} if tiny else {}),
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration,
                        limit_t=700 if cfg.limit_timesteps else None)
    bank = model.embed_prompt_bank([p + ", detailed" for p in cfg.prompts[:8]])
    pool = make_noise_pool(jax.random.key(2), cfg.n_noise, model.latent_shape, dtype)
    src = jnp.clip(
        jax.random.normal(jax.random.key(1), (1, size, size, 3), jnp.float32) * 0.4,
        -1, 1).astype(dtype)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)

    entropy = int(time.time_ns()) & 0x7FFFFFFF
    results = {}
    for b in blocks:
        times = []
        for rep in range(2):
            key = jax.random.key(entropy ^ (b * 1000 + rep))
            t0 = time.time()
            x, hist = run_pgd(model, sampler, plan, cfg, data, key,
                              block_size=b)
            # run_pgd's history fetch already synchronized every dispatch
            dt = time.time() - t0
            times.append(dt)
            log(f"block={b} run{rep}: {dt:.1f}s total, "
                f"{dt / n_steps:.3f} s/step ({len(hist)} rows)")
        results[b] = round(times[-1] / n_steps, 4)   # warm (2nd) run

    best = min(results, key=results.get)
    print(json.dumps({
        "family": family, "image_size": size, "n_steps": n_steps,
        "s_per_step_by_block": {str(k): v for k, v in results.items()},
        "best_block": best, "best_s_per_step": results[best],
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
