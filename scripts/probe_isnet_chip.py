"""On-chip flax ISNet (RMBG-1.4 architecture) mask inference (VERDICT r4
item 5 done-criterion: "mask inference runs on-chip").

Builds the full-size RMBG-shaped ISNet (44 M params; random fast_init — no
network for the real checkpoint, the converter path is manifest-tested) and
runs :func:`salient_mask` end-to-end on the real chip: resize → normalize →
ISNet forward (jitted) → min-max post-process → threshold.  Reports build,
compile, and steady-state forward time, and writes the mask PNG.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_isnet_chip.py
CPU smoke: TID_FORCE_CPU=1 ISNET_PRESET=tiny python scripts/probe_isnet_chip.py
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
import numpy as np
from PIL import Image


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from tml_image_editing_defense_tpu.models.isnet import build_isnet, salient_mask

    preset = os.environ.get("ISNET_PRESET", "rmbg")
    out_png = os.environ.get("ISNET_OUT", "/tmp/isnet_mask.png")
    dev = jax.devices()[0]
    log(f"device: {dev}")

    t0 = time.time()
    bundle = build_isnet(preset, key=jax.random.key(0), fast_init=True)
    n_params = sum(p.size for p in jax.tree.leaves(bundle.params))
    t_build = time.time() - t0
    log(f"built {preset} ISNet ({n_params / 1e6:.1f}M params) in {t_build:.1f}s")

    img = np.asarray(
        Image.open("/root/reference/data/images/japan.jpg").convert("RGB"),
        np.float32) / 255.0

    t0 = time.time()
    mask = salient_mask(bundle, img, out_size=512)
    t_cold = time.time() - t0
    log(f"cold salient_mask (incl. compile): {t_cold:.1f}s")

    # steady state: jit the forward alone, salt the input against the axon
    # server-side execution cache, sync via a one-element fetch
    s = bundle.module.config.image_size
    fwd = jax.jit(lambda p, x: bundle.saliency(p, x))
    entropy = int(time.time_ns()) & 0x7FFFFFFF
    times = []
    for i in range(4):
        x = jax.random.uniform(jax.random.key(entropy + i), (1, s, s, 3),
                               jnp.float32) - 0.5
        t0 = time.time()
        d1 = fwd(bundle.params, x)
        float(d1[0, 0, 0, 0])  # fetch-sync (block_until_ready is unreliable)
        times.append(time.time() - t0)
    log(f"forward times: {[f'{t:.3f}' for t in times]}")

    Image.fromarray((mask * 255).astype(np.uint8), mode="L").save(out_png)
    print(json.dumps({
        "preset": preset, "params_m": round(n_params / 1e6, 1),
        "device": str(dev), "build_s": round(t_build, 1),
        "cold_mask_s": round(t_cold, 1),
        "fwd_s_steady": round(min(times[1:]), 4),
        "mask_fg_frac": round(float(mask.mean()), 4),
        "mask_png": out_png,
    }))


if __name__ == "__main__":
    main()
