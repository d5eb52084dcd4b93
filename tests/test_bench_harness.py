"""Unit tests for bench.py's deadline-aware leg harness.

The driver parses ``bench.py``'s LAST stdout line as the round record, so
the harness (``run_legs`` / ``_run_leg_abandonable`` / ``assemble``) is
driver-facing infrastructure: a regression here silently turns a bench run
into an empty or unparseable record.  These tests pin the behaviors the
round-4 ADVICE findings hardened (and that round 5 exercised live against
a real tunnel outage — docs/PERF.md "Round 5: final driver-style bench"):

- incremental emission: a parseable line lands after EVERY leg outcome,
  and a killed run leaves the freshest complete record;
- the headline leg always runs, and a headline failure emits a degraded
  ``value: null`` line BEFORE raising;
- later legs are skipped (not run) when the remaining budget is under
  their estimate;
- a HUNG leg is abandoned by the watchdog, recorded in ``hung_legs`` +
  ``<name>_error``, and the run continues — while a leg that itself raises
  a builtin ``TimeoutError`` is classified as a *failure*, not a hang
  (``LegHungError`` is a distinct subclass);
- later legs' estimates are reserved out of a hung leg's watchdog budget
  so one hang cannot starve everything after it;
- ``assemble`` distinguishes a bogus 0.0 measurement (surfaces as 0.0 with
  null derived rates) from a missing one (``value: null``).

All tests are pure host logic: fake legs, fake clock, no device work.
"""

from __future__ import annotations

import json
import time

import pytest

import bench
from bench import LegHungError, _run_leg_abandonable, assemble, run_legs


def _emissions():
    lines = []
    return lines, lambda s: lines.append(json.loads(s))


# --------------------------------------------------------------------------
# assemble
# --------------------------------------------------------------------------


def test_assemble_missing_vs_zero_headline():
    # missing → value null, derived rates null
    d = assemble({"n_enc_steps": 200})
    assert d["value"] is None
    assert d["vs_baseline"] is None
    assert d["encoder_steps_per_sec_per_image"] is None
    # 0.0 is a BOGUS measurement and must surface as 0.0 (not vanish as
    # null), with the divisions guarded off
    d = assemble({"enc_s_per_image": 0.0, "n_enc_steps": 200})
    assert d["value"] == 0.0
    assert d["vs_baseline"] is None
    assert d["encoder_steps_per_sec_per_image"] is None
    # real value → derived rates present; private keys never leak
    d = assemble({"enc_s_per_image": 2.5, "n_enc_steps": 200,
                  "enc_b1": 6.5, "_model": object(), "extra": 1})
    assert d["value"] == 2.5 and d["vs_baseline"] == 2.0
    assert d["encoder_steps_per_sec_per_image"] == 80.0
    assert d["encoder_batch1_s_per_image"] == 6.5
    assert d["extra"] == 1 and "_model" not in d


# --------------------------------------------------------------------------
# _run_leg_abandonable
# --------------------------------------------------------------------------


def test_leg_result_contract():
    assert _run_leg_abandonable("a", lambda s: {"x": 1}, {}, 5.0) == {"x": 1}
    # None (a leg with nothing to add) coerces to {}
    assert _run_leg_abandonable("a", lambda s: None, {}, 5.0) == {}
    # a falsy non-dict must fail loudly, not coerce silently (ADVICE r4)
    with pytest.raises(TypeError, match="returned int"):
        _run_leg_abandonable("a", lambda s: 0, {}, 5.0)


def test_hang_vs_own_timeout_error_classification():
    # a leg body raising builtin TimeoutError (socket.timeout alias) is a
    # FAILURE re-raised as-is — never a LegHungError
    def raises_timeout(state):
        raise TimeoutError("backend rpc deadline")

    with pytest.raises(TimeoutError) as ei:
        _run_leg_abandonable("a", raises_timeout, {}, 5.0)
    assert not isinstance(ei.value, LegHungError)

    # a leg that outruns the watchdog IS a LegHungError
    with pytest.raises(LegHungError, match="hung past"):
        _run_leg_abandonable("a", lambda s: time.sleep(30), {}, 0.1)


# --------------------------------------------------------------------------
# run_legs
# --------------------------------------------------------------------------


def test_happy_path_emits_after_every_leg():
    lines, emit = _emissions()
    state = {}
    run_legs(
        [("encoder", 0.0, lambda s: {"enc_s_per_image": 2.5, "n_enc_steps": 200}),
         ("diffusion", 0.0, lambda s: {"diffusion_pgd_s_per_step": 1.6})],
        state, deadline=time.time() + 60, emit=emit,
    )
    assert len(lines) == 2
    assert lines[0]["value"] == 2.5 and "diffusion_pgd_s_per_step" not in lines[0]
    assert lines[1]["diffusion_pgd_s_per_step"] == 1.6
    # the LAST line is the full record
    assert lines[1]["value"] == 2.5


def test_headline_leg_always_runs_and_degraded_line_precedes_raise():
    lines, emit = _emissions()
    # deadline already passed: the headline leg must still run; its failure
    # must emit a parseable degraded line BEFORE the RuntimeError
    with pytest.raises(RuntimeError, match="headline leg 'encoder'"):
        run_legs(
            [("encoder", 500.0, lambda s: (_ for _ in ()).throw(ValueError("boom")))],
            {}, deadline=time.time() - 1, emit=emit,
        )
    assert len(lines) == 1
    assert lines[0]["value"] is None
    assert lines[0]["encoder_error"].startswith("ValueError")


def test_later_leg_skipped_when_budget_short():
    lines, emit = _emissions()
    state = run_legs(
        [("encoder", 0.0, lambda s: {"enc_s_per_image": 2.5, "n_enc_steps": 200}),
         ("sdxl", 10_000.0, lambda s: pytest.fail("must not run"))],
        state={}, deadline=time.time() + 5, emit=emit,
    )
    assert state["skipped_legs"] == ["sdxl"]
    # the skip still emits, so the last line records it
    assert lines[-1]["skipped_legs"] == ["sdxl"]
    assert lines[-1]["value"] == 2.5


def test_hung_later_leg_recorded_and_run_continues():
    # A hung leg consumes its whole watchdog budget, and that budget keeps
    # a grace margin (0.5*min_leg_timeout) past the reservation — so the
    # leg RIGHT AFTER a hang only survives when the reservations of legs
    # beyond it pad the remaining time (est_beyond ≥ grace).  Model the
    # realistic shape: a hang mid-run with two real legs still queued.
    lines, emit = _emissions()
    state = run_legs(
        [("encoder", 0.0, lambda s: {"enc_s_per_image": 2.5, "n_enc_steps": 200}),
         ("diffusion", 0.01, lambda s: time.sleep(30)),
         ("sdxl", 0.5, lambda s: {"sdxl_pgd_s_per_step": 1.7}),
         ("extra", 1.0, lambda s: {"extra_ok": 1})],
        state={}, deadline=time.time() + 5, emit=emit,
        min_leg_timeout=0.2,
    )
    assert state["hung_legs"] == ["diffusion"]
    assert state["diffusion_error"].startswith("TimeoutError")
    # the run continued: sdxl still produced its number, and the last
    # emitted line carries BOTH the hang record and the later results
    assert state["sdxl_pgd_s_per_step"] == 1.7
    assert state["extra_ok"] == 1
    assert lines[-1]["hung_legs"] == ["diffusion"]
    assert lines[-1]["sdxl_pgd_s_per_step"] == 1.7


def test_hung_leg_budget_reserves_later_estimates():
    # capture the timeout run_legs hands the watchdog for a LATER leg:
    # remaining ≈ 100, later legs' estimates sum to 60 → the middle leg must
    # be abandoned around 100 - 60 + 0.5*min_leg_timeout, not given the
    # whole remaining 100 (the ADVICE-r4 starvation fix)
    seen = {}
    orig = bench._run_leg_abandonable

    def spy(name, fn, state, timeout):
        seen[name] = timeout
        return {} if name != "encoder" else {"enc_s_per_image": 1.0,
                                             "n_enc_steps": 200}

    t0 = time.time()
    bench._run_leg_abandonable = spy
    try:
        # freeze the clock so `remaining` is deterministic
        run_legs(
            [("encoder", 0.0, lambda s: None),
             ("diffusion", 10.0, lambda s: None),
             ("sdxl", 60.0, lambda s: None)],
            state={}, deadline=t0 + 100, emit=lambda s: None, now=lambda: t0,
            min_leg_timeout=20.0,
        )
    finally:
        bench._run_leg_abandonable = orig
    # headline: whole remaining + grace
    assert seen["encoder"] == pytest.approx(110.0)
    # diffusion: max(min_leg=20, 2*est=20, 100-60+10=50) = 50 — NOT 110
    assert seen["diffusion"] == pytest.approx(50.0)
    # sdxl (last): nothing left to reserve → remaining + grace
    assert seen["sdxl"] == pytest.approx(110.0)
