"""SDXL-1024 remat-policy sweep with the flash-2 attention backward.

The cv backward freed ~1.8 GB of the 16 GB chip vs the checkpoint-replay
path (docs/PERF.md).  This probe asks whether a cheaper remat policy than
"full" now fits at native 1024² and what it buys: "full" recomputes the
whole UNet forward during the backward (~+33% FLOPs), "dots" saves
unbatched matmul outputs, "conv_dots" additionally saves conv outputs.
Reference anchor: the SDXL attack family /root/reference/main.py:284-295
trains at native resolution (old/train_noise.py:94).

Writes one JSON line per (policy, loss-variant) to stdout; progress to
stderr.  Run: PYTHONPATH=/root/repo python scripts/probe_sdxl_remat.py
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    dev = jax.devices()[0]
    log(f"device: {dev}")
    dtype = jnp.bfloat16

    chunk = os.environ.get("PROBE_CHUNK")  # attention KV-chunk override
    build_kw = {"attn_kv_chunk": int(chunk)} if chunk else {}
    xl = build_model("sdxl", key=jax.random.key(0), dtype=dtype,
                     image_size=1024, fast_init=True, **build_kw)
    src = jnp.clip(
        jax.random.normal(jax.random.key(1), (1, 1024, 1024, 3), jnp.float32) * 0.4,
        -1, 1,
    ).astype(dtype)

    sampler = LCMSampler(xl.schedule)
    plan = sampler.plan(4, limit_t=700)
    bank = xl.embed_prompt_bank([p + ", detailed" for p in PROMPTS_LIST[:4]])
    pool = make_noise_pool(jax.random.key(3), 1, xl.latent_shape, dtype)
    params = {"unet": xl.params["unet"], "vae": xl.params["vae"]}
    xl.params.pop("text", None)

    policies = os.environ.get("PROBE_POLICIES", "dots,conv_dots").split(",")
    for policy in policies:
        try:
            cfg = TrainConfig(
                norm_type="l2", n_denoising_steps_per_iteration=4,
                limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
                use_sdxl=True, image_size=1024, dtype="bfloat16",
                eot_mode="scan", remat_policy=policy, prompts=list(PROMPTS_LIST),
                unroll_denoise=False, remat_vae=True,
                apply_loss_on_images=False, apply_loss_on_latents=True,
                perturbation_loss_lambda=0.0,
            )
            data = make_attack_data(xl, cfg, src, jnp.zeros_like(src), bank, pool)
            step = jax.jit(make_pgd_step(xl, sampler, plan, cfg))
            t0 = time.time()
            compiled = step.lower(params, src, data, _mkey(4)).compile()
            mem_an = {}
            try:
                ma = compiled.memory_analysis()
                mem_an = {
                    "xla_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                    "xla_argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                }
            except Exception:
                pass
            x1, aux = step(params, src, data, _mkey(4))
            _sync(x1)
            compile_s = time.time() - t0
            log(f"[{policy}] compile+first {compile_s:.1f}s "
                f"(loss {float(aux['avg_loss']):.1f}) {mem_an}")
            ts, x = [], x1
            for i in range(2):
                t0 = time.time()
                x, aux = step(params, x, data, _mkey(100 + i))
                _sync(x)
                ts.append(time.time() - t0)
            emit(probe=f"sdxl_1024_pgd_latent_remat_{policy}",
                 s_per_step=round(min(ts), 3), attn_kv_chunk=chunk or "auto",
                 compile_s=round(compile_s, 1), **mem_an)
            log(f"[{policy}] {min(ts):.3f} s/step")
        except Exception as e:
            emit(probe=f"sdxl_1024_pgd_latent_remat_{policy}",
                 error=f"{type(e).__name__}: {str(e)[:300]}")
            log(f"[{policy}] FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
