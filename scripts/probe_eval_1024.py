"""Evaluation-edit economics at 1024² (VERDICT r3 item 7).

The reference's eval loop (``/root/reference/main.py:469-521``) runs
sequential (clean, adv) double-edits per prompt; at SDXL-native 1024²
(``stabilityai/stable-diffusion-xl-base-1.0``, main.py:284-288) each edit is
a 50-step CFG chain over 128² latents.  This probe measures our two dispatch
modes at that size — ``edit_pairs`` (all cells one vmapped program) vs
sequential per-prompt ``__call__`` — and validates the ≥1024² chunked-
attention inference default (build_model's ``attn_kv_chunk="auto"`` rule).

Precision: eval runs f32 like the reference (main.py:446); if the f32
bundle + activations exceed the 16 GB chip, the probe falls back to the
SDXL fp32-VAE analog (UNet bf16, VAE f32 — the reference's own SDXL
precision split, sdxl_img2img_pipeline.py:490-515) and says so in the
output line.

Writes one JSON line to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_eval_1024.py
CPU smoke: PROBE_FAMILY=tiny PROBE_SIZE=64 PROBE_STEPS=2 PROBE_PROMPTS=2 \
           JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/probe_eval_1024.py
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from tml_image_editing_defense_tpu.configs import INFERENCE_PROMPTS
    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.pipelines.img2img import Img2ImgPipeline

    family = os.environ.get("PROBE_FAMILY", "sdxl")
    size = int(os.environ.get("PROBE_SIZE", "1024"))
    steps = int(os.environ.get("PROBE_STEPS", "50"))
    n = int(os.environ.get("PROBE_PROMPTS", "4"))
    sampler = os.environ.get("PROBE_SAMPLER",
                             "euler" if family == "sdxl" else "plms")
    dev = jax.devices()[0]
    log(f"device: {dev}; {family}@{size}², {sampler}-{steps}, {n} prompts")

    def build(dtype, vae_dtype=None):
        return build_model(family, key=jax.random.key(0), dtype=dtype,
                           vae_dtype=vae_dtype, image_size=size,
                           fast_init=True, attn_kv_chunk="auto")

    prompts = [p + ", detailed" for p in INFERENCE_PROMPTS[:n]]
    clean = adv = pair = noises = None
    model = pipe = None

    def make_inputs():
        # (re)create ALL device arrays — the OOM fallback frees every device
        # buffer, so inputs from the f32 attempt are dead after a rebuild.
        nonlocal clean, adv, pair, noises
        clean = jnp.clip(
            jax.random.normal(jax.random.key(1), (size, size, 3), jnp.float32)
            * 0.4, -1, 1,
        )
        adv = jnp.clip(clean + 0.05, -1, 1)
        pair = pipe._prepare_image([clean, adv])
        lat_shape = model.latent_shape
        noises = jnp.stack([
            jax.random.normal(jax.random.key(100 + i), (2,) + lat_shape[1:],
                              jnp.float32)
            for i in range(n)
        ])

    precision = "f32"
    t0 = time.time()
    model = build(jnp.float32)
    log(f"built {family} f32 bundle in {time.time() - t0:.1f}s "
        f"(attn_kv_chunk={model.unet.config.attn_kv_chunk})")
    pipe = Img2ImgPipeline(model, sampler=sampler, dtype=jnp.float32)
    make_inputs()

    out = {"family": family, "size": size, "steps": steps, "sampler": sampler,
           "n_prompts": n, "device": str(dev)}

    def sync(o):
        # jax.block_until_ready does NOT reliably block on the axon plugin
        # (dispatch is async; only host value fetches wait) — end every
        # timed region in a one-element fetch (bench.py `_sync`).
        float(jnp.asarray(o).reshape(-1)[0])
        return o

    def run_seq(seed):
        ks = jax.random.split(jax.random.key(seed), n)
        o = None
        for i, p in enumerate(prompts):
            o = pipe(p, [clean, adv], num_inference_steps=steps,
                     guidance_scale=7.5, strength=0.6, noise=noises[i],
                     key=ks[i], output_type="array")
        return sync(o)

    def run_batched(seed, B):
        ks = jax.random.split(jax.random.key(seed), n)
        outs = []
        for i in range(0, n, B):
            hi = min(i + B, n)
            pad = B - (hi - i)
            sl = list(range(i, hi)) + [hi - 1] * pad
            o = pipe.edit_pairs(
                prompts=[prompts[j] for j in sl],
                pair_images=jnp.broadcast_to(pair, (B,) + pair.shape),
                pair_noises=noises[jnp.asarray(sl)],
                keys=ks[jnp.asarray(sl)],
                num_inference_steps=steps, guidance_scale=7.5, strength=0.6,
            )
            outs.append(o[: hi - i])
        o = jnp.concatenate(outs)
        return sync(o)

    def attempt(fn, *args):
        from tml_image_editing_defense_tpu.utils.profiling import measure_seed

        try:
            t0 = time.time()
            o = fn(measure_seed(7), *args)
            compile_s = time.time() - t0
            finite = bool(jnp.isfinite(o).all())
            t0 = time.time()
            o = fn(measure_seed(11), *args)
            run_s = time.time() - t0
            return {"compile_s": round(compile_s, 1), "s": round(run_s, 2),
                    "s_per_pair": round(run_s / n, 3), "finite": finite}
        except Exception as e:
            msg = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"attempt failed: {msg}")
            return {"error": msg}

    if os.environ.get("PROBE_FORCE_FALLBACK"):
        # CPU smoke hook: exercise the OOM-fallback path (free + rebuild +
        # re-make inputs) without needing a real 16 GB chip to overflow.
        seq = {"error": "RESOURCE_EXHAUSTED (forced for smoke test)"}
    else:
        seq = attempt(run_seq)
    # "HTTP 500: tpu_compile_helper subprocess exit code 1" is the remote
    # helper's HBM-OOM-at-compile signature (CLAUDE.md gotcha): the real
    # RESOURCE_EXHAUSTED message is buried past the truncation.
    if "error" in seq and ("RESOURCE_EXHAUSTED" in seq["error"]
                           or "HTTP 500" in seq["error"]):
        # fp32-VAE analog fallback (reference's own SDXL precision split)
        log("f32 OOM — rebuilding with UNet bf16 + VAE f32")
        precision = "unet-bf16+vae-f32"
        model = pipe = None
        import bench
        bench.free_all_device_memory()
        model = build(jnp.bfloat16, vae_dtype=jnp.float32)
        pipe = Img2ImgPipeline(model, sampler=sampler, dtype=jnp.float32)
        make_inputs()
        seq = attempt(run_seq)
    out["precision"] = precision
    out["sequential"] = seq
    log(f"sequential: {seq}")

    out["batched_b1"] = attempt(run_batched, 1)
    log(f"batched B=1: {out['batched_b1']}")
    out["batched_b2"] = attempt(run_batched, 2)
    log(f"batched B=2: {out['batched_b2']}")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
