"""Unit tests for bench.py's driver-facing harness logic.

The bench itself needs the real TPU chip, but two pieces are pure control
flow and must behave deterministically:

- the outage-recovery wait loop (`wait_for_backend`): return immediately
  when the backend is up, retry while it is down, and give up at the
  deadline so the driver sees the real in-process error rather than a
  silent hang (live-outage behavior also validated — docs/PERF.md);
- the deadline-aware leg runner (`run_legs`, VERDICT r3 item 1): a complete
  JSON line after EVERY leg so a driver kill mid-leg still leaves a valid
  last line, skip legs that no longer fit the wall-clock budget, and record
  (never propagate) later-leg failures.
"""

from __future__ import annotations

import json
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


def _headline_leg(state):
    return {"enc_s_per_image": 2.0, "enc_b1": 5.0, "n_enc_steps": 200,
            "encoder_mfu": 0.78}


def test_run_legs_emits_after_every_leg_and_skips_past_deadline():
    """Simulated-slow run: the SDXL leg no longer fits the budget → it is
    skipped and the already-emitted diffusion line is the final record."""
    emitted = []
    clock = {"t": 0.0}

    def now():
        return clock["t"]

    def slow_headline(state):
        clock["t"] += 900.0  # slow tunnel round (BENCH_r03's failure mode)
        return _headline_leg(state)

    def diffusion(state):
        assert state["enc_s_per_image"] == 2.0  # legs see earlier results
        clock["t"] += 400.0
        return {"diffusion_pgd_s_per_step": 1.66}

    def sdxl(state):
        pytest.fail("sdxl leg must be skipped: 80s left < 300s estimate")

    state = bench.run_legs(
        [("encoder", 0.0, slow_headline),
         ("diffusion", 120.0, diffusion),
         ("sdxl", 300.0, sdxl)],
        {"device": "fake"}, deadline=1380.0, emit=emitted.append, now=now,
    )
    assert len(emitted) == 3  # encoder, diffusion, skip-record for sdxl
    first, last = json.loads(emitted[0]), json.loads(emitted[-1])
    # the first line is already a complete driver record
    assert first["value"] == 2.0
    assert first["unit"] == "s/image/chip"
    assert first["vs_baseline"] == pytest.approx(2.5)
    assert "diffusion_pgd_s_per_step" not in first
    # the last line carries everything measured + the skip record
    assert last["diffusion_pgd_s_per_step"] == 1.66
    assert last["skipped_legs"] == ["sdxl"]
    assert state["skipped_legs"] == ["sdxl"]
    # no private (device-holding) keys leak into the emitted JSON
    assert not any(k.startswith("_") for k in last)


def test_run_legs_records_later_leg_failure_and_keeps_headline():
    emitted = []

    def boom(state):
        raise RuntimeError("RESOURCE_EXHAUSTED: hbm")

    bench.run_legs(
        [("encoder", 0.0, _headline_leg), ("sdxl", 0.0, boom)],
        {}, deadline=float("inf"), emit=emitted.append,
    )
    last = json.loads(emitted[-1])
    assert last["value"] == 2.0
    assert "RESOURCE_EXHAUSTED" in last["sdxl_error"]


def test_run_legs_headline_failure_emits_degraded_line_then_raises():
    """A headline failure must still leave a parseable last line (value:
    null + the error) before raising — an empty stdout is the one outcome
    the driver cannot use."""
    emitted = []

    def boom(state):
        raise RuntimeError("no backend")

    with pytest.raises(RuntimeError, match="headline leg"):
        bench.run_legs([("encoder", 0.0, boom)], {}, deadline=float("inf"),
                       emit=emitted.append)
    last = json.loads(emitted[-1])
    assert last["value"] is None
    assert "no backend" in last["encoder_error"]


def test_run_legs_hung_later_leg_abandoned_and_recorded():
    """A leg that never returns (lost backend RPC — observed live in round
    4: a worker restart ate the encoder leg's first fetch) is abandoned by
    the watchdog; the record carries the hang and the run completes."""
    import threading

    emitted = []

    def hang(state):
        threading.Event().wait()  # blocks forever; daemon thread abandoned

    state = bench.run_legs(
        [("encoder", 0.0, _headline_leg), ("diffusion", 0.0, hang)],
        {}, deadline=0.0, emit=emitted.append, now=lambda: 0.0,
        min_leg_timeout=0.3,
    )
    last = json.loads(emitted[-1])
    assert last["value"] == 2.0
    assert state["hung_legs"] == ["diffusion"]
    assert "hung past" in last["diffusion_error"]


def test_run_legs_hung_headline_emits_degraded_line_then_raises():
    import threading

    emitted = []

    def hang(state):
        threading.Event().wait()

    with pytest.raises(RuntimeError, match="headline leg"):
        bench.run_legs([("encoder", 0.0, hang)], {}, deadline=0.0,
                       emit=emitted.append, now=lambda: 0.0,
                       min_leg_timeout=0.3)
    last = json.loads(emitted[-1])
    assert last["value"] is None
    assert last["hung_legs"] == ["encoder"]


def test_run_legs_hung_leg_reserves_later_leg_budget():
    """ADVICE r4: a hung leg's watchdog timeout must RESERVE later legs'
    estimated costs, so the sdxl leg still gets its slice instead of being
    starved by a diffusion hang that ate the whole remaining budget."""
    import threading
    import time as _time

    emitted = []

    def hang(state):
        threading.Event().wait()

    ran = []

    def sdxl(state):
        ran.append(True)
        return {"sdxl_pgd_s_per_step": 1.7}

    # fake clock: 1000s budget of which sdxl's estimate reserves 999.9 —
    # without reservation the diffusion watchdog would wait ~1000 real
    # seconds; with it, the timeout clamps to min_leg_timeout and sdxl
    # (whose estimate still fits the un-advanced clock) runs afterwards
    t0 = _time.time()
    state = bench.run_legs(
        [("encoder", 0.0, _headline_leg),
         ("diffusion", 0.0, hang),
         ("sdxl", 999.9, sdxl)],
        {}, deadline=1000.0, emit=emitted.append, now=lambda: 0.0,
        min_leg_timeout=0.3,
    )
    assert _time.time() - t0 < 30  # watchdog fired quickly
    assert state["hung_legs"] == ["diffusion"]
    assert ran  # sdxl still ran after the hang
    assert json.loads(emitted[-1])["sdxl_pgd_s_per_step"] == 1.7


def test_leg_raising_builtin_timeouterror_is_failure_not_hang():
    """ADVICE r4: a leg body that itself raises TimeoutError (socket.timeout
    alias) must be classified as a leg failure, not a watchdog hang."""
    emitted = []

    def raises_timeout(state):
        raise TimeoutError("socket read timed out")

    state = bench.run_legs(
        [("encoder", 0.0, _headline_leg), ("diffusion", 0.0, raises_timeout)],
        {}, deadline=float("inf"), emit=emitted.append,
    )
    assert "hung_legs" not in state
    assert "socket read timed out" in state["diffusion_error"]


def test_leg_returning_non_dict_fails_loudly():
    state = {}
    with pytest.raises(TypeError, match="not dict"):
        bench._run_leg_abandonable("x", lambda s: [1, 2], state, 5.0)
    # None (a leg with nothing to merge) is still tolerated
    assert bench._run_leg_abandonable("x", lambda s: None, state, 5.0) == {}


def test_run_legs_first_leg_always_runs_even_past_deadline():
    """The headline leg is never skipped — a late start (backend outage ate
    the budget) should still try to produce the one metric that matters."""
    emitted = []
    bench.run_legs(
        [("encoder", 1e9, _headline_leg)],
        {}, deadline=-1.0, emit=emitted.append,
    )
    assert json.loads(emitted[-1])["value"] == 2.0


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
    once = flops - cfg.grad_reps * per_rep    # encode fwd+vjp (no vis decode)
    assert once > 0
    assert flops2 == pytest.approx(cfg2.grad_reps * per_rep + once)


def test_run_legs_headline_never_starved_by_reservation():
    """Reserving later legs' estimates must not shrink the HEADLINE leg's
    watchdog: a healthy-but-slow encoder leg (cold compiles after a backend
    outage ate the budget) must be allowed the full remaining time — losing
    the headline degrades the whole record while later legs only ever get
    leftovers anyway."""
    import time as _time

    emitted = []

    def slow_headline(state):
        _time.sleep(0.6)   # > old max(min_leg_timeout, remaining - reserved)
        return _headline_leg(state)

    def never(state):
        return {}

    state = bench.run_legs(
        [("encoder", 0.0, slow_headline),
         ("diffusion", 5.0, never), ("sdxl", 5.0, never)],
        {}, deadline=1.0, emit=emitted.append, now=lambda: 0.0,
        min_leg_timeout=0.3,
    )
    assert "hung_legs" not in state
    assert json.loads(emitted[0])["value"] == 2.0


def test_run_legs_later_leg_floored_at_twice_estimate():
    """A later leg that runs past (remaining - reservation) but within 2×
    its own estimate is merely slow, not hung — abandoning it to protect
    legs that will be skipped anyway discards a completed result."""
    import time as _time

    emitted = []

    def slow_diffusion(state):
        _time.sleep(0.6)
        return {"diffusion_pgd_s_per_step": 1.7}

    state = bench.run_legs(
        [("encoder", 0.0, _headline_leg),
         ("diffusion", 0.5, slow_diffusion),
         ("sdxl", 5.0, lambda s: {})],
        {}, deadline=1.0, emit=emitted.append, now=lambda: 0.0,
        min_leg_timeout=0.3,
    )
    assert state.get("hung_legs") is None
    assert state["diffusion_pgd_s_per_step"] == 1.7
