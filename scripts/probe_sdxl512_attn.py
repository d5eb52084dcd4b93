"""SDXL@512 attention-impl sweep for the bench leg's training build.

The bench's SDXL leg (bench.py::sdxl_leg) builds with ``attn_kv_chunk=512``
— the setting that made SDXL-1024 fit.  At 512² the SDXL UNet's longest
self-attention is only T=1024 (attention lives at the 32²/16² levels,
/root/reference/pipelines/sdxl_img2img_pipeline.py denoising path), so the
chunked scan's win there is unproven; only the VAE mid-block (T=4096) is
long.  With the flash-2 analytic backward now default and remat "none",
this probe asks which chunk setting is fastest: None (fused), 512, 1024.

Writes one JSON line per setting to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo python scripts/probe_sdxl512_attn.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from bench import free_all_device_memory  # the one HBM-reclaim impl (bench.py)
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

    log(f"device: {jax.devices()[0]}")
    dtype = jnp.bfloat16
    settings = os.environ.get("PROBE_CHUNKS", "none,512,1024").split(",")

    for s in settings:
        chunk = None if s == "none" else int(s)
        try:
            xl = build_model("sdxl", key=jax.random.key(7), dtype=dtype,
                             image_size=512, fast_init=True, attn_kv_chunk=chunk)
            src = jnp.clip(
                jax.random.normal(jax.random.key(1), (1, 512, 512, 3), jnp.float32) * 0.4,
                -1, 1,
            ).astype(dtype)
            cfg = TrainConfig(
                norm_type="l2", n_denoising_steps_per_iteration=4,
                limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
                use_sdxl=True, image_size=512, dtype="bfloat16",
                eot_mode="scan", remat_policy="none",
                prompts=list(PROMPTS_LIST), unroll_denoise=False,
            )
            sampler = LCMSampler(xl.schedule)
            plan = sampler.plan(cfg.n_denoising_steps_per_iteration, limit_t=700)
            bank = xl.embed_prompt_bank([p + ", detailed" for p in PROMPTS_LIST[:4]])
            pool = make_noise_pool(jax.random.key(3), 1, xl.latent_shape, dtype)
            params = {"unet": xl.params["unet"], "vae": xl.params["vae"]}
            data = make_attack_data(xl, cfg, src, jnp.zeros_like(src), bank, pool)
            step = jax.jit(make_pgd_step(xl, sampler, plan, cfg))
            t0 = time.time()
            x, aux = step(params, src, data, _mkey(4))
            _sync(x)
            compile_s = time.time() - t0
            ts = []
            for i in range(3):
                t0 = time.time()
                x, aux = step(params, x, data, _mkey(100 + i))
                _sync(x)
                ts.append(time.time() - t0)
            print(json.dumps({"probe": f"sdxl_512_pgd_attn_{s}",
                              "s_per_step": round(min(ts), 4),
                              "compile_s": round(compile_s, 1)}), flush=True)
            log(f"[{s}] {min(ts):.4f} s/step (compile+first {compile_s:.1f}s)")
            del xl, params, data, step, x
            free_all_device_memory()
        except Exception as e:
            print(json.dumps({"probe": f"sdxl_512_pgd_attn_{s}",
                              "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)
            log(f"[{s}] FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
