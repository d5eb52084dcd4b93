"""Encoder-attack batch-size sweep: does throughput keep improving past the
bench headline's batch 8?

The encoder attack (bench leg 1, PhotoGuard ``super_l2``/``super_linf`` —
/root/reference/old/yuval_playground.py:211-316) is conv-dominated and
already at 78% MFU at batch 8; this probe measures s/image at batch
8/16/32 to see whether a bigger batch amortizes further or HBM/XLA
scheduling turns it over.  The bench leg stays at 8 unless a win here is
confirmed by a full driver-style bench run (PERF.md rule).

Writes one JSON line per batch to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_encoder_batch.py
CPU smoke: PROBE_FAMILY=tiny PROBE_STEPS=4 JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
           python scripts/probe_encoder_batch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from bench import free_all_device_memory  # the one HBM-reclaim impl (bench.py)
# reliable completion-wait: block_until_ready is a no-op on the async
# axon plugin; only host value fetches wait (docs/PERF.md measurement gotchas)
from tml_image_editing_defense_tpu.utils.profiling import sync as _sync
from tml_image_editing_defense_tpu.utils.profiling import measure_key as _mkey


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from tml_image_editing_defense_tpu.attack.encoder_attack import (
        make_encoder_attack_loop,
    )
    from tml_image_editing_defense_tpu.models import build_model

    dev = jax.devices()[0]
    log(f"device: {dev}")
    dtype = jnp.bfloat16
    family = os.environ.get("PROBE_FAMILY", "sd15")
    n_steps = int(os.environ.get("PROBE_STEPS", "200"))
    batches = [int(b) for b in
               os.environ.get("PROBE_BATCHES", "8,16,32").split(",")]

    model = build_model(family, key=jax.random.key(0), dtype=dtype,
                        fast_init=True,
                        attn_kv_chunk=512 if family == "sd15" else None)
    size = model.image_size
    loop = jax.jit(make_encoder_attack_loop(
        model, n_steps=n_steps, norm_type="linf", step_size=0.006, eps=0.1))

    src1 = jax.random.uniform(jax.random.key(1), (1, size, size, 3), dtype,
                              -1.0, 1.0)
    for batch in batches:
        try:
            srcB = jnp.broadcast_to(src1, (batch, size, size, 3))
            target_latent = model.encode_image(model.params["vae"], srcB)
            t0 = time.time()
            x_adv, _ = loop(model.params, srcB, target_latent, _mkey(2))
            _sync(x_adv)
            compile_s = time.time() - t0
            times = []
            for i in range(3):
                t0 = time.time()
                # vary the key per call — the axon runtime caches executions
                # with bit-identical arguments
                x_adv, _ = loop(model.params, srcB, target_latent,
                                _mkey(100 + i))
                _sync(x_adv)
                times.append(time.time() - t0)
            per_img = min(times) / batch
            emit(batch=batch, s_per_image=round(per_img, 4),
                 steps_per_s_per_image=round(n_steps / per_img, 1),
                 compile_s=round(compile_s, 1))
            log(f"B={batch}: {per_img:.3f} s/image")
            del srcB, target_latent, x_adv
        except Exception as e:
            emit(batch=batch, error=f"{type(e).__name__}: {str(e)[:300]}")
            free_all_device_memory()


if __name__ == "__main__":
    main()
