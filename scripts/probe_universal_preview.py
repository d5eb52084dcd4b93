"""Measure the TAESD preview decoder's win in the universal-attack step.

The reference's universal-perturbation trainer decodes the edited latents
with ``AutoencoderTiny`` (taesdxl) inside every EOT gradient rep
(``old/train_noise.py:82, 151``) instead of the full VAE decoder.  Round 3
implemented that decoder (models/tiny_vae.py); this probe A/Bs the full
universal step (SD-1.5 family @512², grad_reps=4, bf16) with the full-VAE
fallback vs the preview path on the real chip.

Writes one JSON line per variant to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_universal_preview.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
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
    from tml_image_editing_defense_tpu.attack.universal import (
        UniversalConfig,
        make_universal_step,
    )
    from tml_image_editing_defense_tpu.models import build_model, build_tiny_autoencoder

    dev = jax.devices()[0]
    log(f"device: {dev}")
    dtype = jnp.bfloat16
    # PROBE_FAMILY=tiny PROBE_SIZE=32 JAX_PLATFORMS=cpu → CPU smoke run.
    # The reference's native universal config (old/train_noise.py:20-48,94)
    # is PROBE_FAMILY=sdxl PROBE_SIZE=1024 PROBE_REPS=10 PROBE_REMAT=full.
    family = os.environ.get("PROBE_FAMILY", "sd15")
    size = int(os.environ.get("PROBE_SIZE", "512"))
    reps = int(os.environ.get("PROBE_REPS", "4"))
    remat = os.environ.get("PROBE_REMAT", "none")
    preset = "tiny" if family.startswith("tiny") else "taesd"

    model = build_model(family, key=jax.random.key(0), dtype=dtype,
                        image_size=size, fast_init=True,
                        attn_kv_chunk=512 if size >= 512 else None)
    cfg = UniversalConfig(grad_reps=reps, image_size=size,
                          remat_policy=remat)
    bank = model.embed_prompt_bank(
        [(cfg.default_prompt + " " + e).strip() for e in cfg.edit_prompts])
    # The text encoders only feed the (precomputed) prompt bank — drop their
    # ~1.6 GB (SDXL) of params from HBM before the big step programs; at
    # 1024² the margin decides between fitting and ResourceExhausted
    # (same hygiene as scripts/probe_sdxl_1024.py).
    model.params.pop("text", None)

    rng = np.random.default_rng(0)
    source = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), dtype)
    pert0 = jnp.zeros_like(source)

    variants = {"full_vae": None}
    preview = build_tiny_autoencoder(preset, key=jax.random.key(1),
                                     dtype=dtype, image_size=size)
    variants["taesd_preview"] = preview

    # PROBE_VARIANTS=taesd_preview → measure only the reference's own config
    # (at SDXL@1024² the full-VAE fallback needs 16.93 GB — a compile-time
    # HBM OOM on the 16 GB chip, recorded as an error line, docs/PERF.md)
    only = os.environ.get("PROBE_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}

    for name, pv in variants.items():
        params = model.params
        if pv is not None:
            params = dict(params, preview_vae=pv.params)
        step = jax.jit(make_universal_step(model, cfg, bank, preview=pv))
        try:
            t0 = time.time()
            pert, loss = step(params, pert0, source, _mkey(2))
            _sync(pert)
            compile_s = time.time() - t0
        except Exception as e:
            # one variant's OOM must not lose the others' measurements
            emit(variant=name, family=family, size=size, reps=reps,
                 remat=remat, error=f"{type(e).__name__}: {str(e)[:400]}")
            log(f"{name}: FAILED {type(e).__name__} (full error to stderr)")
            log(str(e))
            continue
        times = []
        for i in range(5):
            k = _mkey(3 + i)               # salted: axon caches across runs too
            t0 = time.time()
            pert, loss = step(params, pert0, source, k)
            _sync(pert)
            times.append(time.time() - t0)
        emit(variant=name, family=family, size=size, reps=reps, remat=remat,
             step_s=round(min(times), 4),
             median_s=round(sorted(times)[len(times) // 2], 4),
             compile_s=round(compile_s, 1), loss=float(loss))
        log(f"{name}: min {min(times):.3f}s median {sorted(times)[2]:.3f}s")


if __name__ == "__main__":
    main()
