"""Measure SDXL at native 1024² on the real chip (VERDICT r1 item 6).

The reference trains SDXL immunization at its native resolution
(/root/reference/main.py:284-295 loads stable-diffusion-xl-base-1.0;
old/train_noise.py:94 uses 1024² perturbations).  Round 1 only ever ran
SDXL at 512²; this probe answers SURVEY §7's "make-or-break" question —
does the fwd+bwd PGD step through the 2.57B-param UNet fit one chip at
1024², and at what cost:

  1. one evaluation edit (LCM-4, inference only) at 1024²
  2. one diffusion PGD step (reference L2 config: 10 EOT reps × LCM chain
     with t<700 filter × CFG) per remat policy, with peak-HBM stats

Writes one JSON line per measurement to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo python scripts/probe_sdxl_1024.py
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


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model
    from tml_image_editing_defense_tpu.pipelines.img2img import Img2ImgPipeline
    from tml_image_editing_defense_tpu.utils.profiling import device_memory_stats

    dev = jax.devices()[0]
    log(f"device: {dev}")
    dtype = jnp.bfloat16

    t0 = time.time()
    xl = build_model("sdxl", key=jax.random.key(0), dtype=dtype,
                     image_size=1024, fast_init=True)
    log(f"built SDXL@1024 in {time.time() - t0:.1f}s; "
        f"latent_shape={xl.latent_shape}")
    src = jnp.clip(
        jax.random.normal(jax.random.key(1), (1, 1024, 1024, 3), jnp.float32) * 0.4,
        -1, 1,
    ).astype(dtype)

    # ---- 1. eval edit (inference only, LCM-4 like run_all.py:69-93) -------
    import os as _os
    try:
        if _os.environ.get("PROBE_SKIP_EVAL"):
            raise RuntimeError("skipped (PROBE_SKIP_EVAL)")
        pipe = Img2ImgPipeline(xl, sampler="lcm", dtype=dtype)
        t0 = time.time()
        out = pipe("a photo of a lake, detailed", src, num_inference_steps=4,
                   guidance_scale=3.0, strength=0.6, output_type="array",
                   key=_mkey(2))
        _sync(out)
        log(f"eval edit compile+run {time.time() - t0:.1f}s")
        ts = []
        for i in range(3):
            t0 = time.time()
            out = pipe("a photo of a lake, detailed", src, num_inference_steps=4,
                       guidance_scale=3.0, strength=0.6, output_type="array",
                       key=_mkey(10 + i))
            _sync(out)
            ts.append(time.time() - t0)
        mem = device_memory_stats(dev)
        emit(probe="sdxl_1024_eval_edit_lcm4", s_per_edit=round(min(ts), 3),
             peak_hbm_gb=round(mem.get("peak_bytes_in_use", 0) / 2**30, 2))
        log(f"eval edit: {min(ts):.3f}s, peak HBM "
            f"{mem.get('peak_bytes_in_use', 0) / 2**30:.2f} GB")
    except Exception as e:
        emit(probe="sdxl_1024_eval_edit_lcm4", error=f"{type(e).__name__}: {e}")
        log(f"eval edit FAILED: {type(e).__name__}: {e}")

    # ---- 2. PGD step per remat policy --------------------------------------
    sampler = LCMSampler(xl.schedule)
    plan = sampler.plan(4, limit_t=700)
    bank = xl.embed_prompt_bank([p + ", detailed" for p in PROMPTS_LIST[:4]])
    pool = make_noise_pool(jax.random.key(3), 1, xl.latent_shape, dtype)

    # The text encoders are only needed for the (precomputed) prompt bank —
    # drop their ~1.6 GB of params from HBM before the big step programs.
    params = {"unet": xl.params["unet"], "vae": xl.params["vae"]}
    xl.params.pop("text", None)

    # Fit strategy (measured via /tmp bisects, docs/PERF.md): the whole-step
    # fwd+bwd at 1024² exceeds 16 GB HBM unless (a) attention never
    # materializes its score matrices (attn_kv_chunk, auto-on at 1024²),
    # (b) the VAE encode/decode are checkpointed (remat_vae), and (c) the
    # denoise scan uses full remat.  The "HTTP 500 helper crash" round 1
    # recorded was an HBM OOM surfaced badly by the AOT compile helper.
    variants = [
        ("full_latent_r10", dict(apply_loss_on_images=False,
                                 apply_loss_on_latents=True,
                                 perturbation_loss_lambda=0.0)),
        ("full_image_r10", dict()),   # the reference L2 config
    ]
    # PROBE_REMAT="dots:1,full:0" → (remat_policy, remat_vae) variants of
    # the latent-loss step.  The flash-2 analytic attention backward freed
    # ~1.7 GB of XLA temp at 1024² (docs/PERF.md); this knob measures
    # whether a lighter remat now fits in the freed headroom and pays.
    if _os.environ.get("PROBE_REMAT"):
        variants = []
        for spec in _os.environ["PROBE_REMAT"].split(","):
            policy, vae = spec.split(":")
            variants.append((
                f"{policy}_vae{vae}_latent_r10",
                dict(apply_loss_on_images=False, apply_loss_on_latents=True,
                     perturbation_loss_lambda=0.0, remat_policy=policy,
                     remat_vae=bool(int(vae))),
            ))
    for name, extra in variants:
        try:
            cfg = TrainConfig(
                norm_type="l2", n_denoising_steps_per_iteration=4,
                limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
                use_sdxl=True, image_size=1024, dtype="bfloat16",
                eot_mode="scan", prompts=list(PROMPTS_LIST),
                unroll_denoise=False,
                **{"remat_policy": "full", "remat_vae": True, **extra},
            )
            data = make_attack_data(xl, cfg, src, jnp.zeros_like(src), bank, pool)
            step = jax.jit(make_pgd_step(xl, sampler, plan, cfg))
            t0 = time.time()
            # AOT compile so XLA's own memory analysis is available (the
            # axon runtime does not expose device memory_stats)
            compiled = step.lower(params, src, data, _mkey(4)).compile()
            mem_an = {}
            try:
                ma = compiled.memory_analysis()
                mem_an = {
                    "xla_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
                    "xla_argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
                    "xla_output_gb": round(ma.output_size_in_bytes / 2**30, 2),
                }
            except Exception:
                pass
            x1, aux = step(params, src, data, _mkey(4))
            _sync(x1)
            compile_s = time.time() - t0
            log(f"[{name}] compile+first {compile_s:.1f}s "
                f"(loss {float(aux['avg_loss']):.1f})")
            ts, x = [], x1
            for i in range(2):
                t0 = time.time()
                x, aux = step(params, x, data, _mkey(100 + i))
                _sync(x)
                ts.append(time.time() - t0)
            mem = device_memory_stats(dev)
            emit(probe=f"sdxl_1024_pgd_step_{name}",
                 s_per_step=round(min(ts), 3),
                 s_per_250step_image=round(250 * min(ts), 1),
                 compile_s=round(compile_s, 1),
                 peak_hbm_gb=round(mem.get("peak_bytes_in_use", 0) / 2**30, 2),
                 hbm_limit_gb=round(mem.get("bytes_limit", 0) / 2**30, 2),
                 **mem_an)
            log(f"[{name}] {min(ts):.3f} s/step, peak HBM "
                f"{mem.get('peak_bytes_in_use', 0) / 2**30:.2f} GB")
        except Exception as e:
            # Full text to stderr: RESOURCE_EXHAUSTED allocation tables are
            # the whole point of a failed run (CLAUDE.md "HTTP 500" note).
            log(f"[{name}] FAILED (full error follows):\n{e}")
            emit(probe=f"sdxl_1024_pgd_step_{name}",
                 error=f"{type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
