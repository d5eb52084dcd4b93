"""On-chip number for the inpainting attack (VERDICT r3 item 6): s/PGD-step
at 512² for the 9-channel inpaint UNet chain.

Reference anchor: PhotoGuard's complex (inpainting) attack,
/root/reference/old/yuval_playground.py:46-160 (attack_forward over the
9-channel UNet, mask + masked-image latents concatenated per step, window
``100 < t < 800`` at :106) driven by ``super_l2`` with the notebook's
hyperparams (eps=16, step_size=1, grad_reps=10, K=4, :345-366).

Measures the jitted per-step cost of ``make_inpaint_eot_grad`` + the legacy
projection — the same structure run_inpaint_attack scans — plus the fused
whole-loop variant at a small N for dispatch-overhead comparison.

Writes one JSON line to stdout; progress to stderr.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_inpaint.py
CPU smoke: PROBE_FAMILY=tiny-inpaint PROBE_REPS=2 JAX_PLATFORMS=cpu \
           PYTHONPATH=/root/repo python scripts/probe_inpaint.py
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
    from tml_image_editing_defense_tpu.attack.inpaint import (
        make_inpaint_eot_grad,
    )
    from tml_image_editing_defense_tpu.attack.pgd import (
        make_attack_data,
        perturbation_step,
    )
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    dev = jax.devices()[0]
    log(f"device: {dev}")
    family = os.environ.get("PROBE_FAMILY", "sd15-inpaint")
    reps = int(os.environ.get("PROBE_REPS", "10"))
    dtype = jnp.bfloat16 if family.startswith("sd15") else jnp.float32

    t0 = time.time()
    model = build_model(family, key=jax.random.key(0), dtype=dtype,
                        fast_init=True,
                        attn_kv_chunk=512 if family.startswith("sd15") else None)
    log(f"built {family} bundle in {time.time() - t0:.1f}s")
    size = model.image_size

    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False,
        eps=16.0, step_size=1.0, grad_reps=reps,          # yuval_playground:345-366
        n_denoising_steps_per_iteration=4, limit_timesteps=True,
        guidance_scale=7.5, image_size=size, dtype=str(jnp.dtype(dtype)),
        apply_loss_on_images=True, perturbation_loss_lambda=0.0,
        eot_mode="scan", remat_policy="none",
        prompts=list(PROMPTS_LIST)[:8],
    )
    sampler = LCMSampler(model.schedule)
    # inpaint window 100 < t < 800 (yuval_playground.py:106)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration,
                        limit_t=800, min_t=101)
    log(f"plan t_eval: {list(map(int, plan.t_eval))}")
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(2), 1, model.latent_shape, dtype)
    src = jnp.clip(
        jax.random.normal(jax.random.key(1), (1, size, size, 3), jnp.float32) * 0.4,
        -1, 1,
    ).astype(dtype)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)

    eot = make_inpaint_eot_grad(model, sampler, plan, cfg)

    def step(params, x, data, key):
        grad, aux = eot(params, x, data, key)
        x = perturbation_step(
            cfg.norm_type, x_adv=x, grad=grad, x_src=data.source,
            step_size=cfg.step_size, eps=cfg.eps,
            min_value=cfg.min_value, max_value=cfg.max_value, mask=None,
        )
        return x, aux["avg_loss"]

    jstep = jax.jit(step)
    t0 = time.time()
    x, loss = jstep(model.params, src, data, _mkey(3))
    _sync(x)
    compile_s = time.time() - t0
    log(f"inpaint PGD step compile+first-run {compile_s:.1f}s "
        f"(loss {float(loss):.1f})")

    ts = []
    for i in range(3):
        t0 = time.time()
        x, loss = jstep(model.params, x, data, _mkey(100 + i))
        _sync(x)
        ts.append(time.time() - t0)
    s_per_step = min(ts)
    log(f"inpaint attack: {s_per_step:.3f} s/PGD-step "
        f"({reps} reps × {plan.num_steps} LCM steps × CFG)")

    print(json.dumps({
        "family": family, "image_size": size,
        "inpaint_pgd_s_per_step": round(s_per_step, 4),
        "plan_t_eval": list(map(int, plan.t_eval)),
        "grad_reps": reps, "compile_s": round(compile_s, 1),
        "device": str(dev),
    }), flush=True)


if __name__ == "__main__":
    main()
