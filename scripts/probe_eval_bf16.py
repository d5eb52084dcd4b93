#!/usr/bin/env python
"""Is bf16 numerically safe for PLMS-50 evaluation? (VERDICT r2 item 6)

The reference evaluates in f32 (``Trainer.load_models(dtype=torch.float32)``
for inference, main.py:446); our eval defaults to f32 for parity.  PLMS-50
at guidance 7.5 is the reference's heavyweight eval mode
(configs.py:168-171) and is compute-bound (PERF.md) — bf16 UNet would ~2×
the MXU rate IF 50 accumulating sampler steps don't degrade the image.

Measures per-edit time f32 vs bf16 (and bf16 UNet + f32 VAE) and the PSNR
of each bf16 variant against the f32 reference edit on the final [0,1]
image — the quantity that decides whether the eval *grids* change.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_eval_bf16.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import free_all_device_memory  # the one HBM-reclaim impl (bench.py)
# reliable completion-wait: block_until_ready is a no-op on the async
# axon plugin; only host value fetches wait (docs/PERF.md measurement gotchas)
from tml_image_editing_defense_tpu.utils.profiling import sync as _sync
from tml_image_editing_defense_tpu.utils.profiling import measure_key as _mkey


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(1.0 / mse)


def run_variant(name, dtype, vae_dtype, n_steps=50, n_meas=3):
    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.pipelines.img2img import Img2ImgPipeline

    model = build_model("sd15", key=jax.random.key(0), dtype=dtype,
                        fast_init=True, vae_dtype=vae_dtype)
    pipe = Img2ImgPipeline(model, sampler="plms", dtype=dtype)
    clean = jnp.clip(
        jax.random.normal(jax.random.key(1), (512, 512, 3), jnp.float32) * 0.4,
        -1, 1,
    )
    noise = jax.random.normal(jax.random.key(2), (1,) + model.latent_shape[1:],
                              jnp.float32)
    out = pipe("a fairytale castle, detailed", clean, num_inference_steps=n_steps,
               guidance_scale=7.5, strength=0.6, noise=noise,
               key=_mkey(3), output_type="array")
    _sync(out)
    ts = []
    for i in range(n_meas):
        t0 = time.time()
        o = pipe("a fairytale castle, detailed", clean,
                 num_inference_steps=n_steps, guidance_scale=7.5, strength=0.6,
                 noise=noise, key=_mkey(3 + i), output_type="array")
        _sync(o)
        ts.append(time.time() - t0)
    arr = np.asarray(jax.device_get(out), np.float32)
    log(f"[{name}] {min(ts):.3f} s/edit; finite={np.isfinite(arr).all()}")
    # free HBM before the next variant
    del model, pipe
    free_all_device_memory()
    return arr, min(ts)


def main():
    f32, t_f32 = run_variant("f32", jnp.float32, jnp.float32)
    bf16, t_bf16 = run_variant("bf16", jnp.bfloat16, jnp.bfloat16)
    mixed, t_mixed = run_variant("bf16 unet + f32 vae", jnp.bfloat16, jnp.float32)
    out = {
        "plms50_f32_s_per_edit": round(t_f32, 3),
        "plms50_bf16_s_per_edit": round(t_bf16, 3),
        "plms50_bf16_f32vae_s_per_edit": round(t_mixed, 3),
        "psnr_bf16_vs_f32_db": round(psnr(bf16, f32), 2),
        "psnr_bf16_f32vae_vs_f32_db": round(psnr(mixed, f32), 2),
        "bf16_speedup": round(t_f32 / t_bf16, 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
