"""Sweep PGD diffusion-step knobs on the real chip (VERDICT r1 item 3).

The round-1 profile put ~75% of the 2.67 s/step in conv fusions; the levers
that change conv MFU without touching numerics of a single rep are:

- ``eot_chunk``: vmap chunks of EOT reps through the UNet/VAE → conv batch
  grows from 2 (CFG pair) to 2×chunk → better MXU utilization, more
  activation memory (identical math, equivalence-tested in
  tests/test_pgd.py).
- ``remat_policy``: what the backward recomputes vs saves.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_sweep_pgd.py [chunk ...]
Emits one JSON line per cell to stdout; set XLA_FLAGS externally to compare
flag sets.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
# reliable completion-wait: block_until_ready is a no-op on the async
# axon plugin; only host value fetches wait (docs/PERF.md measurement gotchas)
from tml_image_editing_defense_tpu.utils.profiling import sync as _sync
from tml_image_editing_defense_tpu.utils.profiling import measure_key as _mkey

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.utils.profiling import device_memory_stats

    chunks = [int(a) for a in sys.argv[1:]] or [1, 2, 5, 10]
    policies = os.environ.get("SWEEP_POLICIES", "dots").split(",")
    dtype = jnp.bfloat16
    dev = jax.devices()[0]
    log(f"device={dev} XLA_FLAGS={os.environ.get('XLA_FLAGS', '')!r}")

    model = build_model("sd15", key=jax.random.key(0), dtype=dtype, fast_init=True,
                        attn_kv_chunk=int(os.environ.get("SWEEP_ATTN_CHUNK", "512")) or None)
    src = jnp.clip(
        jax.random.normal(jax.random.key(1), (1, 512, 512, 3), jnp.float32) * 0.4,
        -1, 1,
    ).astype(dtype)
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(4, limit_t=700)
    bank = model.embed_prompt_bank([p + ", detailed" for p in PROMPTS_LIST[:8]])
    pool = make_noise_pool(jax.random.key(2), 1, model.latent_shape, dtype)

    for policy in policies:
        for chunk in chunks:
            try:
                cfg = TrainConfig(
                    norm_type="l2", n_denoising_steps_per_iteration=4,
                    limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
                    image_size=512, dtype="bfloat16", eot_mode="scan",
                    eot_chunk=chunk, remat_policy=policy,
                    prompts=list(PROMPTS_LIST),
                )
                data = make_attack_data(model, cfg, src, jnp.zeros_like(src),
                                        bank, pool)
                step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
                t0 = time.time()
                compiled = step.lower(model.params, src, data,
                                      _mkey(3)).compile()
                try:
                    ma = compiled.memory_analysis()
                    temp_gb = round(ma.temp_size_in_bytes / 2**30, 2)
                except Exception:
                    temp_gb = None
                x, aux = step(model.params, src, data, _mkey(3))
                _sync(x)
                compile_s = time.time() - t0
                ts = []
                for i in range(3):
                    t0 = time.time()
                    x, aux = step(model.params, x, data, _mkey(50 + i))
                    _sync(x)
                    ts.append(time.time() - t0)
                mem = device_memory_stats(dev)
                rec = dict(policy=policy, eot_chunk=chunk,
                           s_per_step=round(min(ts), 4),
                           compile_s=round(compile_s, 1),
                           loss=round(float(aux["avg_loss"]), 2),
                           xla_temp_gb=temp_gb,
                           peak_hbm_gb=round(mem.get("peak_bytes_in_use", 0) / 2**30, 2))
                print(json.dumps(rec), flush=True)
                log(f"policy={policy} chunk={chunk}: {min(ts):.3f} s/step "
                    f"(peak {rec['peak_hbm_gb']} GB)")
            except Exception as e:
                print(json.dumps(dict(policy=policy, eot_chunk=chunk,
                                      error=f"{type(e).__name__}: {str(e)[:200]}")),
                      flush=True)
                log(f"policy={policy} chunk={chunk} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
