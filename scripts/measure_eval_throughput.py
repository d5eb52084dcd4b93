"""Measure the evaluation edit dispatch on the real chip.

VERDICT r1 weak #6: sequential (clean, adv) double-edits made a 19-prompt
evaluation of one image cost ≈40 s at PLMS-50.  Round 2 batches all
(prompt × noise) cells into one vmapped ``edit_pairs`` dispatch
(api.evaluate ``batch_edits=True``); this script measures both modes with
the same pair contract (reference loop: main.py:469-521).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_eval_throughput.py
"""

from __future__ import annotations

import json
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
    from tml_image_editing_defense_tpu.configs import INFERENCE_PROMPTS
    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.pipelines.img2img import Img2ImgPipeline

    dtype = jnp.float32   # the reference's inference precision
    model = build_model("sd15", key=jax.random.key(0), dtype=dtype, fast_init=True)
    pipe = Img2ImgPipeline(model, sampler="plms", dtype=dtype)
    clean = jnp.clip(
        jax.random.normal(jax.random.key(1), (512, 512, 3), jnp.float32) * 0.4,
        -1, 1,
    )
    adv = jnp.clip(clean + 0.05, -1, 1)
    pair = pipe._prepare_image([clean, adv])                # [2,H,W,3]
    lat_shape = model.latent_shape
    prompts = [p + ", detailed" for p in INFERENCE_PROMPTS]
    n = len(prompts)
    keys = jax.random.split(_mkey(3), n)
    pair_noises = jnp.stack([
        jax.random.normal(jax.random.key(100 + i), (2,) + lat_shape[1:], dtype)
        for i in range(n)
    ])
    log(f"{n} prompts, PLMS-50, 512², f32")

    B = 2   # fused-attention-safe micro-batch: each pair is 4 UNet images
            # (2 images x CFG); at B=2 the transient f32 scores are
            # [8,8,4096,4096] = 4.3 GB.  B=8 under chunked attention ran but
            # was SLOWER than sequential; B>=8 under fused attention OOMs.

    def run_batched(seed):
        ks = jax.random.split(_mkey(seed), n)
        outs = []
        for i in range(0, n, B):
            hi = min(i + B, n)
            pad = B - (hi - i)
            sl = list(range(i, hi)) + [hi - 1] * pad
            o = pipe.edit_pairs(
                prompts=[prompts[j] for j in sl],
                pair_images=jnp.broadcast_to(pair, (B,) + pair.shape),
                pair_noises=pair_noises[jnp.asarray(sl)],
                keys=ks[jnp.asarray(sl)],
                num_inference_steps=50, guidance_scale=7.5, strength=0.6,
            )
            outs.append(o[: hi - i])
        return jnp.concatenate(outs)

    t0 = time.time()
    out = run_batched(3)
    _sync(out)
    log(f"batched compile+first: {time.time() - t0:.1f}s")
    ts = []
    for i in range(2):
        t0 = time.time()
        out = run_batched(10 + i)
        _sync(out)
        ts.append(time.time() - t0)
    batched_s = min(ts)
    log(f"batched {n}-prompt eval: {batched_s:.2f}s ({batched_s / n:.3f} s/pair)")

    # -- sequential: one dispatch per prompt (round-1 behavior) ------------
    o = pipe(prompts[0], [clean, adv], num_inference_steps=50,
             guidance_scale=7.5, strength=0.6, noise=pair_noises[0],
             key=keys[0], output_type="array")
    _sync(o)
    t0 = time.time()
    for i, p in enumerate(prompts):
        o = pipe(p, [clean, adv], num_inference_steps=50, guidance_scale=7.5,
                 strength=0.6, noise=pair_noises[i], key=keys[i],
                 output_type="array")
    _sync(o)
    seq_s = time.time() - t0
    log(f"sequential {n}-prompt eval: {seq_s:.2f}s")

    # -- LCM-4 (the sweep driver's eval mode, run_all.py:59-93) ------------
    from tml_image_editing_defense_tpu.models import build_model as _bm
    lcm_pipe = Img2ImgPipeline(model, sampler="lcm", dtype=dtype)

    def run_lcm_batched(seed):
        ks = jax.random.split(_mkey(seed), n)
        outs = []
        for i in range(0, n, B):
            hi = min(i + B, n)
            pad = B - (hi - i)
            sl = list(range(i, hi)) + [hi - 1] * pad
            o = lcm_pipe.edit_pairs(
                prompts=[prompts[j] for j in sl],
                pair_images=jnp.broadcast_to(pair, (B,) + pair.shape),
                pair_noises=pair_noises[jnp.asarray(sl)],
                keys=ks[jnp.asarray(sl)],
                num_inference_steps=4, guidance_scale=3.0, strength=0.6,
            )
            outs.append(o[: hi - i])
        return jnp.concatenate(outs)

    out = run_lcm_batched(3)
    _sync(out)
    t0 = time.time()
    out = run_lcm_batched(11)
    _sync(out)
    lcm_b = time.time() - t0
    o = lcm_pipe(prompts[0], [clean, adv], num_inference_steps=4,
                 guidance_scale=3.0, strength=0.6, noise=pair_noises[0],
                 key=keys[0], output_type="array")
    _sync(o)
    t0 = time.time()
    for i, p in enumerate(prompts):
        o = lcm_pipe(p, [clean, adv], num_inference_steps=4, guidance_scale=3.0,
                     strength=0.6, noise=pair_noises[i], key=keys[i],
                     output_type="array")
    _sync(o)
    lcm_s = time.time() - t0
    log(f"LCM-4: batched {lcm_b:.2f}s, sequential {lcm_s:.2f}s")

    print(json.dumps({
        "eval_19prompt_batched_s": round(batched_s, 2),
        "eval_19prompt_sequential_s": round(seq_s, 2),
        "speedup": round(seq_s / batched_s, 2),
        "eval_lcm4_batched_s": round(lcm_b, 2),
        "eval_lcm4_sequential_s": round(lcm_s, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
