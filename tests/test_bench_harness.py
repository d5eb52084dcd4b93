"""Unit tests for bench.py's driver-facing harness logic.

The bench itself needs the real TPU chip, but the outage-recovery wait loop
(`wait_for_backend`) is pure control flow around a subprocess probe and must
behave deterministically: return immediately when the backend is up, retry
while it is down, and give up at the deadline so the driver sees the real
in-process error rather than a silent hang.  (The live-outage behavior was
also validated against a real tunnel outage — docs/PERF.md.)
"""

from __future__ import annotations

import subprocess
import sys
import types

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


class _FakeCompleted:
    def __init__(self, returncode, stderr=""):
        self.returncode = returncode
        self.stderr = stderr


def test_wait_returns_immediately_when_backend_up(monkeypatch):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return _FakeCompleted(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: pytest.fail("slept"))
    bench.wait_for_backend()
    assert len(calls) == 1
    # the probe must EXECUTE a jitted program: an init-only probe (observed
    # live) reports recovery while compile/execute still hangs
    assert "jax.jit" in calls[0][-1]


def test_wait_retries_then_recovers(monkeypatch):
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        if state["n"] < 3:
            return _FakeCompleted(1, stderr="UNAVAILABLE: TPU backend setup/compile error")
        return _FakeCompleted(0)

    slept = []
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "1500")
    bench.wait_for_backend()
    assert state["n"] == 3
    assert slept == [60, 60]


def test_wait_gives_up_at_deadline(monkeypatch):
    """Probes that hang (TimeoutExpired) must not loop past the deadline."""
    state = {"n": 0}

    def fake_run(cmd, **kw):
        state["n"] += 1
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 180))

    # Deadline of 0 ⇒ exactly one probe, then proceed (no sleep).
    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: pytest.fail("slept past deadline"))
    monkeypatch.setenv("BENCH_BACKEND_WAIT_S", "0")
    bench.wait_for_backend()
    assert state["n"] == 1


@pytest.mark.parametrize("family,use_sdxl", [("tiny", False), ("tiny-sdxl", True)])
def test_diffusion_step_flops_counts_both_families(family, use_sdxl):
    """bench.diffusion_step_flops traces the step FLOPs for SD-1.5-shaped
    AND SDXL-shaped bundles (the SDXL branch threads pooled text_embeds +
    time_ids through apply_unet).  Trace-only: runs on the CPU test mesh."""
    import jax
    import jax.numpy as jnp

    from tml_image_editing_defense_tpu.attack import make_attack_data
    from tml_image_editing_defense_tpu.configs import TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    model = build_model(family, key=jax.random.key(0), image_size=32)
    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False, eps=8.0, step_size=1.0,
        n_denoising_steps_per_iteration=2, limit_timesteps=False, grad_reps=2,
        guidance_scale=3.0, image_size=32, use_sdxl=use_sdxl,
        apply_loss_on_images=True, prompts=["a"],
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration)
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(1), 1, model.latent_shape)
    src = jnp.zeros((1, 32, 32, 3))
    data = make_attack_data(model, cfg, src, src, bank, pool)
    assert (data.bank_pooled is not None) == use_sdxl

    flops = bench.diffusion_step_flops(model, cfg, plan, data, src, jnp.float32)
    assert flops > 0
    # doubling the EOT reps must scale the per-rep (UNet+decode) term exactly
    cfg2 = type(cfg)(**{**cfg.asdict(), "grad_reps": 4})
    flops2 = bench.diffusion_step_flops(model, cfg2, plan, data, src, jnp.float32)
    assert flops2 > flops
    per_rep = (flops2 - flops) / 2
    once = flops - cfg.grad_reps * per_rep    # encode fwd+vjp + vis decode
    assert once > 0
    assert flops2 == pytest.approx(cfg2.grad_reps * per_rep + once)
