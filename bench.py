"""Headline benchmark — prints driver-parseable JSON lines (LAST line wins).

Primary metric: wall-clock to immunize one 512² image with the SD-1.5
encoder attack (200 PGD steps, L∞), per chip — BASELINE.md's quantified
north-star target is < 5 s/image/chip, so ``vs_baseline = 5.0 / value``
(>1 ⇒ target beaten).  Extra keys report the diffusion-attack PGD step rate
(reference L2 config: 10 EOT reps × 2 LCM steps × CFG, remat backprop) and
the SDXL step rate.

Driver robustness (VERDICT r3 item 1 — round 3's perf was lost to rc=124):
the bench is a sequence of LEGS.  A complete JSON result line is printed to
stdout immediately after the FIRST (headline) leg and re-printed, updated,
after every later leg — so a driver kill at any point still leaves a valid
last line.  A wall-clock deadline (env ``BENCH_DEADLINE_S``, measured from
process start) skips any remaining leg whose estimated cost no longer fits,
flushing what exists instead of timing out with nothing.

Models are random-weight but full-architecture SD-1.5 (identical compute
graph and cost to converted checkpoints), bf16 on the MXU.
All progress goes to stderr; stdout carries only JSON result lines.

HBM hygiene (VERDICT r2 item 1): the SD-1.5 legs keep their device
references inside the leg state; the SDXL leg drops them and then deletes
every surviving device buffer before the 2.57B-param build.  Without this
the SDXL fwd+bwd program (7.9 GB XLA temp + 5.1 GB params) OOMs the 16 GB
chip next to the resident SD-1.5 bundle (BENCH_r02: RESOURCE_EXHAUSTED).
"""

from __future__ import annotations

import json
import os
import sys
import time

_T_START = time.time()

import jax
import jax.numpy as jnp

# Persistent compilation cache: remote TPU compiles here run ~1-5 min for the
# big fwd+bwd programs; caching makes driver re-runs near-instant.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def free_all_device_memory() -> None:
    """Drop every live device buffer + cached executable this process holds.

    ``jax.clear_caches()`` alone keeps arrays alive through Python refs; the
    caller must let its references die first (pop them from the leg state),
    then this deletes whatever stragglers remain (donated outputs, cached
    constants) so the next leg starts from an empty HBM.
    """
    jax.clear_caches()
    n = 0
    for a in jax.live_arrays():
        try:
            a.delete()
            n += 1
        except Exception:
            pass
    log(f"freed {n} live device arrays")


def _make_src(key, dtype):
    src = jnp.clip(
        jax.random.normal(key, (1, 512, 512, 3), jnp.float32) * 0.4, -1, 1
    )
    return src.astype(dtype)


# Measured calls must differ bit-wise from EVERY previous run, not only from
# each other within a run: the axon runtime caches executions on
# (executable, args) SERVER-side, the persistent compile cache makes the
# executables byte-identical across runs, and fast_init params are
# deterministic — so constant per-call keys (key(100+i)) replay as ~2 ms
# no-ops the second time the full bench runs in one sandbox (observed:
# encoder leg "0.0002 s/image" on a repeat run).  Salt every measured/warmup
# key with process entropy; model-build keys stay constant on purpose (a
# cached generator execution is a harmless speedup, params are identical).
_ENTROPY = int(time.time_ns()) & 0x7FFFFFFF


def _measure_key(i: int):
    return jax.random.key(_ENTROPY ^ ((0x9E3779B9 * (i + 1)) & 0x7FFFFFFF))


def _sync(x) -> float:
    """Force COMPLETION of the program that produced ``x`` (any array; uses
    its first element) and return that element as a float.

    ``jax.block_until_ready`` is a NO-OP on the current axon plugin —
    dispatch is fully async and only host value fetches wait (measured: a
    34 s program "blocks" in 0.000 s; the wait moved entirely to the first
    ``float(...)``).  Every timed region must therefore end in a scalar
    fetch.  An execution materializes all outputs atomically, so fetching
    one element waits for the whole program."""
    return float(jnp.asarray(x).reshape(-1)[0])


def vae_encode_flops(model, src) -> int:
    """Trace-only FLOP count of one VAE image encode (shared by the encoder
    MFU and the diffusion-step FLOP model — traced exactly once per leg)."""
    from tml_image_editing_defense_tpu.utils import flops as F

    return F.count_fn_flops(
        lambda p, im: model.encode_image(p["vae"], im), model.params, src,
    )


def diffusion_step_flops(model, cfg, plan, data, src, dtype, enc=None) -> int:
    """Analytic model FLOPs of one diffusion PGD step (both families).

    Traces the UNet (with SDXL text_time conditioning when the attack data
    carries pooled embeds), VAE encode (reused via ``enc`` when the caller
    already traced it), and VAE decode jaxprs — trace only, no compile — and
    combines them with the step structure (utils/flops.pgd_step_model_flops).
    """
    from tml_image_editing_defense_tpu.utils import flops as F

    lat = jnp.zeros((2,) + model.latent_shape[1:], dtype)
    ctx2 = jnp.zeros((2,) + data.bank_embeds.shape[1:], dtype)
    kw = {}
    if data.bank_pooled is not None:
        kw["text_embeds"] = jnp.zeros((2, data.bank_pooled.shape[-1]), dtype)
        kw["time_ids"] = jnp.zeros((2, 6), dtype)
    unet1 = F.count_fn_flops(
        lambda p, l, t, c: model.apply_unet(p["unet"], l, t, c, **kw),
        model.params, lat, jnp.asarray(519, jnp.int32), ctx2,
    )
    if enc is None:
        enc = vae_encode_flops(model, src)
    dec = F.count_fn_flops(
        lambda p, z: model.decode_latent(p["vae"], z, scaled=False),
        model.params, jnp.zeros(model.latent_shape, dtype),
    )
    return F.pgd_step_model_flops(
        plan.num_steps * unet1, enc, dec, cfg.grad_reps,
        image_loss=cfg.apply_loss_on_images,
    )


# --------------------------------------------------------------------------
# Legs.  Each leg takes the shared mutable ``state`` dict and returns a dict
# of result keys to merge; device-holding objects go in under "_"-prefixed
# keys (stripped from the emitted JSON).
# --------------------------------------------------------------------------


def encoder_leg(state: dict) -> dict:
    """HEADLINE: 200-step SD-1.5 encoder-attack immunization (L∞)."""
    from tml_image_editing_defense_tpu.attack.encoder_attack import (
        make_encoder_attack_loop,
    )
    from tml_image_editing_defense_tpu.models import build_model

    dtype = state["_dtype"]
    out: dict = {}
    t0 = time.time()
    # attn_kv_chunk=512: the training-path attention impl (api.immunize's
    # choice at 512²) — the benched programs are all fwd+bwd attacks.
    model = build_model("sd15", key=jax.random.key(0), dtype=dtype,
                        fast_init=True, attn_kv_chunk=512)
    out["build_s"] = round(time.time() - t0, 1)
    log(f"built SD-1.5 bundle (random bf16 weights) in {out['build_s']}s")

    key = _measure_key(1)
    src = _make_src(jax.random.key(1), dtype)

    # 200-step immunization, one scan.  Headline = per-chip throughput at
    # batch 8 (a sweep immunizes many images; batch-1 latency as extra key).
    n_enc_steps = 200
    enc_loop = jax.jit(
        make_encoder_attack_loop(
            model, n_steps=n_enc_steps, norm_type="linf", step_size=0.006, eps=0.1
        )
    )

    def measure_encoder(batch: int) -> float:
        srcB = jnp.broadcast_to(src, (batch, 512, 512, 3))
        target_latent = model.encode_image(model.params["vae"], srcB)
        t0 = time.time()
        x_adv, losses = enc_loop(model.params, srcB, target_latent, key)
        _sync(losses)
        log(f"encoder B={batch} compile+first-run {time.time() - t0:.1f}s")
        # NOTE: vary the key per call (axon caches executions on identical
        # (executable, args)) AND end the timed region in a _sync fetch
        # (block_until_ready does not block on this plugin).
        times = []
        for i in range(3):
            t0 = time.time()
            x_adv, losses = enc_loop(
                model.params, srcB, target_latent, _measure_key(100 + i)
            )
            _sync(losses)
            times.append(time.time() - t0)
        per_img = min(times) / batch
        log(f"encoder attack B={batch}: {per_img:.3f} s/image "
            f"({n_enc_steps / per_img:.1f} steps/s/image)")
        return per_img

    out["enc_b1"] = measure_encoder(1)
    out["enc_s_per_image"] = measure_encoder(8)
    out["n_enc_steps"] = n_enc_steps

    # encoder-attack MFU: per PGD step = encode fwd + input-grad bwd at B=8
    from tml_image_editing_defense_tpu.utils import flops as F

    enc = vae_encode_flops(model, src)
    enc_step_flops = F.input_grad_flops(8 * enc)
    enc_mfu = F.mfu(enc_step_flops * n_enc_steps, out["enc_s_per_image"] * 8)
    if enc_mfu is not None:
        out["encoder_mfu"] = round(enc_mfu, 4)
        log(f"encoder-attack MFU: {enc_mfu:.1%}")

    out["_model"] = model
    out["_src"] = src
    out["_enc_flops"] = enc
    return out


def diffusion_leg(state: dict) -> dict:
    """SD-1.5 diffusion-attack PGD step (reference L2 config)."""
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler

    dtype = state["_dtype"]
    model = state["_model"]
    src = state["_src"]
    out: dict = {}
    cfg = TrainConfig(
        norm_type="l2",                      # → eps=32, step 7.5, reps 10
        n_denoising_steps_per_iteration=4,
        limit_timesteps=True,                # → 2 effective LCM steps
        guidance_scale=3.0,
        use_lcm=True,
        image_size=512,
        dtype="bfloat16",
        eot_mode="scan",
        remat_policy="none",   # sweep winner: 2.42 s/step vs dots 2.66
        prompts=list(PROMPTS_LIST),
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration, limit_t=700)
    bank = model.embed_prompt_bank(
        [p + ", detailed" for p in cfg.prompts[:8]]  # bank slice: same cost/step
    )
    pool = make_noise_pool(jax.random.key(2), cfg.n_noise, model.latent_shape, dtype)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    # decode_vis=False: measure the hot-path step run_pgd actually drives —
    # 24 of every 25 product iterations skip the vis decode (interval 25)
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg, decode_vis=False))
    t0 = time.time()
    x1, aux = step(model.params, src, data, _measure_key(3))
    first_loss = _sync(aux["avg_loss"])
    log(f"diffusion PGD step compile+first-run {time.time() - t0:.1f}s "
        f"(loss {first_loss:.1f})")
    t0 = time.time()
    n_meas = 3
    x = x1
    for i in range(n_meas):
        x, aux = step(model.params, x, data, _measure_key(200 + i))
    _sync(aux["avg_loss"])  # steps chain on x; one fetch syncs the chain
    diff_s_per_step = (time.time() - t0) / n_meas
    out.update({
        "diffusion_pgd_s_per_step": round(diff_s_per_step, 4),
        "diffusion_pgd_steps_per_sec": round(1.0 / diff_s_per_step, 4),
        "diffusion_200step_s_per_image": round(200 * diff_s_per_step, 2),
    })
    log(f"diffusion attack: {diff_s_per_step:.3f} s/PGD-step "
        f"({1/diff_s_per_step:.2f} steps/s; 10 reps × 2 LCM steps × CFG)")

    # Analytic MFU: useful model FLOPs (fwd + 2×fwd for bwd, remat
    # recompute NOT counted) / wall-clock / peak chip bf16 FLOPs.
    from tml_image_editing_defense_tpu.utils import flops as F

    step_flops = diffusion_step_flops(
        model, cfg, plan, data, src, dtype, enc=state.get("_enc_flops")
    )
    out["diffusion_model_tflops_per_step"] = round(step_flops / 1e12, 2)
    diff_mfu = F.mfu(step_flops, diff_s_per_step)
    if diff_mfu is not None:
        out["mfu"] = round(diff_mfu, 4)
        log(f"diffusion MFU: {diff_mfu:.1%} "
            f"({step_flops/1e12:.1f} model TFLOPs / step)")
    return out


def sdxl_leg(state: dict) -> dict:
    """SDXL diffusion PGD step (on by default; BENCH_SDXL=0 skips).

    Bounded: 512² (the reference's SDXL *training* size in main.py is also
    512 — old/train_noise.py works at 1024, measured separately in
    docs/PERF.md), 3 measured steps, compile cached across driver runs.
    MUST run with HBM emptied of the SD-1.5 bundle (see module docstring).
    """
    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import PROMPTS_LIST, TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    dtype = state["_dtype"]
    # all SD-1.5 device references live in the leg state; drop them, then
    # reclaim HBM before the 2.57B-param build (VERDICT r2 item 1)
    for k in ("_model", "_src", "_enc_flops"):
        state.pop(k, None)
    free_all_device_memory()

    out: dict = {}
    t0 = time.time()
    xl = build_model("sdxl", key=jax.random.key(7), dtype=dtype,
                     image_size=512, fast_init=True, attn_kv_chunk=512)
    log(f"built SDXL bundle in {time.time() - t0:.1f}s")
    src = _make_src(jax.random.key(1), dtype)
    cfg = TrainConfig(
        norm_type="l2", n_denoising_steps_per_iteration=4,
        limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
        use_sdxl=True, image_size=512, dtype="bfloat16",
        eot_mode="scan", remat_policy="none",   # 1.65 s/step vs 1.80 dots
        prompts=list(PROMPTS_LIST),
    )
    xsampler = LCMSampler(xl.schedule)
    xplan = xsampler.plan(4, limit_t=700)
    xbank = xl.embed_prompt_bank([p + ", detailed" for p in PROMPTS_LIST[:4]])
    xpool = make_noise_pool(jax.random.key(8), 1, xl.latent_shape, dtype)
    xdata = make_attack_data(xl, cfg, src, jnp.zeros_like(src), xbank, xpool)
    xstep = jax.jit(make_pgd_step(xl, xsampler, xplan, cfg, decode_vis=False))
    t0 = time.time()
    x1, xaux = xstep(xl.params, src, xdata, _measure_key(9))
    _sync(xaux["avg_loss"])
    log(f"SDXL PGD step compile+first-run {time.time() - t0:.1f}s")
    ts = []
    x = x1
    for i in range(3):
        t0 = time.time()
        x, xaux = xstep(xl.params, x, xdata, _measure_key(300 + i))
        _sync(xaux["avg_loss"])
        ts.append(time.time() - t0)
    out["sdxl_pgd_s_per_step"] = round(min(ts), 4)
    log(f"SDXL diffusion step: {min(ts):.3f}s")

    try:
        # trace-only analytic MFU (same counting as the SD-1.5 leg);
        # never let a counting failure taint the timing above
        from tml_image_editing_defense_tpu.utils import flops as F

        step_flops = diffusion_step_flops(xl, cfg, xplan, xdata, src, dtype)
        out["sdxl_model_tflops_per_step"] = round(step_flops / 1e12, 2)
        xl_mfu = F.mfu(step_flops, min(ts))
        if xl_mfu is not None:
            out["sdxl_mfu"] = round(xl_mfu, 4)
            log(f"SDXL MFU: {xl_mfu:.1%} "
                f"({step_flops/1e12:.1f} model TFLOPs / step)")
    except Exception as e:
        log(f"SDXL MFU counting failed (timing unaffected): "
            f"{type(e).__name__}: {e}")
    return out


# --------------------------------------------------------------------------
# Harness: deadline-aware leg runner + incremental JSON emission.
# --------------------------------------------------------------------------


def assemble(state: dict) -> dict:
    """Build the driver-facing JSON dict from accumulated leg results.

    Tolerates a missing headline metric (``value: null``) so a line can be
    emitted even when the headline leg hung or failed — a parseable degraded
    record with the error attached beats an empty stdout.
    """
    enc = state.get("enc_s_per_image")
    extras = {
        k: v for k, v in state.items()
        if not k.startswith("_")
        and k not in ("enc_b1", "enc_s_per_image", "n_enc_steps")
    }
    # `enc is not None` (not truthiness): a 0.0 measurement is bogus and must
    # surface as 0.0 with null derived rates, not vanish as value=null
    have_enc = enc is not None
    return {
        "metric": "SD1.5 encoder-attack immunization, 200 PGD steps @512² (L∞, batch 8)",
        "value": round(enc, 4) if have_enc else None,
        "unit": "s/image/chip",
        "vs_baseline": round(5.0 / enc, 3) if have_enc and enc > 0 else None,
        "encoder_steps_per_sec_per_image": (
            round(state["n_enc_steps"] / enc, 2) if have_enc and enc > 0 else None
        ),
        "encoder_batch1_s_per_image": (
            round(state["enc_b1"], 4) if "enc_b1" in state else None
        ),
        "elapsed_s": round(time.time() - _T_START, 1),
        **extras,
    }


class LegHungError(TimeoutError):
    """Watchdog abandon signal — distinct from any builtin TimeoutError a leg
    body might itself raise (socket.timeout is an alias since 3.10), so a
    leg's own timeout is classified as a failure, not a hang."""


def _run_leg_abandonable(name: str, fn, state: dict, timeout: float):
    """Run ``fn(state)`` in a daemon thread and abandon it past ``timeout``.

    A lost in-flight RPC on the tunneled backend hangs a host value fetch
    FOREVER (observed live in round 4: the encoder leg's first fetch never
    returned while a fresh process could compile+execute fine — a worker
    restart ate the reply).  Python cannot kill the thread, but daemon=True
    means it cannot block process exit either, and the main thread stays
    free to emit the driver record and give later legs their slice of the
    deadline.  Caveats of abandoning: a late result from the zombie thread
    is DISCARDED (``box`` is never re-read after the abandon), and the
    thread may keep issuing backend RPCs concurrently with the next leg's
    dispatches on the same client.
    """
    import threading

    box: dict = {}

    def work():
        try:
            box["result"] = fn(state)
        except BaseException as e:  # noqa: BLE001 — must cross the thread
            box["error"] = e

    t = threading.Thread(target=work, daemon=True, name=f"bench-leg-{name}")
    t.start()
    t.join(None if timeout == float("inf") else timeout)
    if t.is_alive():
        raise LegHungError(
            f"leg {name!r} hung past {timeout:.0f}s (thread abandoned; "
            "lost-RPC/worker-restart signature — or a COLD remote compile "
            "outrunning the leg budget: the abandoned compile still lands "
            "in the persistent cache, so a re-run completes warm)"
        )
    if "error" in box:
        raise box["error"]
    result = box.get("result")
    if result is None:
        return {}
    if not isinstance(result, dict):
        raise TypeError(f"leg {name!r} returned {type(result).__name__}, not dict")
    return result


def run_legs(legs, state, deadline, emit=None, now=time.time,
             min_leg_timeout=120.0) -> dict:
    """Run ``legs`` = [(name, min_est_cost_s, fn), ...] in order against a
    wall-clock ``deadline`` (absolute, same clock as ``now``).

    - The FIRST leg always runs (it produces the headline metric).
    - A later leg is skipped when the remaining time is under its estimated
      cost — the already-emitted result line is the record for this run.
    - Every leg runs under a watchdog (`_run_leg_abandonable`): a leg that
      hangs on a lost backend RPC is abandoned at the deadline (+ a small
      grace so the watchdog, not the driver's kill, ends it), recorded in
      ``hung_legs``/``<name>_error``, and the run continues — the r3/r4
      failure mode where one hung fetch produced an EMPTY stdout is gone.
    - After every completed / failed / hung leg, the full result line is
      re-emitted; the LAST stdout line is the driver's record, so a kill at
      any point leaves the freshest complete result.  A headline leg that
      produced no metric still emits a degraded (``value: null``) line
      before raising.
    - A later-leg failure is recorded as ``<name>_error`` and never aborts
      the run.
    """
    if emit is None:
        emit = lambda s: print(s, flush=True)  # noqa: E731
    first = True
    for i, (name, est, fn) in enumerate(legs):
        remaining = deadline - now()
        if not first and remaining < est:
            log(f"skipping leg {name!r}: {remaining:.0f}s left < ~{est:.0f}s "
                "estimated — emitted results stand")
            state.setdefault("skipped_legs", []).append(name)
            emit(json.dumps(assemble(state)))
            continue
        # Reserve later legs' estimated costs so one hung leg cannot consume
        # the whole remaining budget and starve everything after it — BUT
        # never starve the headline leg (losing it degrades the entire
        # record; later legs only ever get leftovers anyway), and floor a
        # later leg at 2× its own estimate so a merely-slow leg is not
        # abandoned to protect legs that would be skipped regardless.
        if first:
            timeout = remaining + 0.5 * min_leg_timeout
        else:
            reserved = sum(e for _, e, _ in legs[i + 1:])
            timeout = max(
                min_leg_timeout, 2.0 * est,
                remaining - reserved + 0.5 * min_leg_timeout,
            )
            timeout = min(timeout, remaining + 0.5 * min_leg_timeout)
        try:
            state.update(_run_leg_abandonable(name, fn, state, timeout))
        except LegHungError as e:
            log(f"{name} leg HUNG: {e}")
            state[f"{name}_error"] = f"TimeoutError: {e}"
            state.setdefault("hung_legs", []).append(name)
        except Exception as e:
            log(f"{name} leg failed: {type(e).__name__}: {e}")
            state[f"{name}_error"] = f"{type(e).__name__}: {e}"
        emit(json.dumps(assemble(state)))
        if first and "enc_s_per_image" not in state:
            raise RuntimeError(
                f"headline leg {name!r} produced no metric: "
                + str(state.get(f"{name}_error"))
            )
        first = False
    return state


def wait_for_backend() -> None:
    """Ride out transient TPU-tunnel outages before touching the backend.

    The axon backend has been observed to HANG in-process for >60 min during
    infra outages ("UNAVAILABLE: TPU backend setup/compile error"), which
    would otherwise turn a driver bench run into a zero.  Probe in a
    short-timeout subprocess and only proceed once it succeeds (or a
    deadline passes — then let the real error surface in-process).

    The probe runs a tiny jitted matmul, not just ``jax.devices()``: a
    second outage mode (observed live) leaves device *listing* healthy while
    compile/execute hangs, so an init-only probe reports recovery into a
    backend that still swallows the first real program.
    """
    import subprocess

    deadline = time.time() + float(os.environ.get("BENCH_BACKEND_WAIT_S", "1500"))
    probe = (
        "import jax, jax.numpy as jnp; "
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache'); "
        "print(jax.jit(lambda x: (x @ x).sum())"
        "(jnp.ones((128, 128), jnp.bfloat16)))"
    )
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, text=True, timeout=180,
            )
            if r.returncode == 0:
                if attempt > 1:
                    log(f"backend recovered on probe {attempt}")
                return
            err = (r.stderr or "").strip().splitlines()
            err = err[-1] if err else f"exit {r.returncode}"
        except subprocess.TimeoutExpired:
            err = "probe timed out after 180s (backend init hang)"
        if time.time() >= deadline:
            log(f"backend still unavailable after {attempt} probes ({err}); "
                "proceeding — the in-process error will be authoritative")
            return
        log(f"backend probe {attempt} failed ({err}); retrying in 60s")
        time.sleep(60)


def main() -> None:
    # Deadline measured from process start so backend-outage waits count
    # against it too.  Default 1380s ≈ the observed driver budget minus the
    # margin a final emission needs; override with BENCH_DEADLINE_S.
    deadline = _T_START + float(os.environ.get("BENCH_DEADLINE_S", "1380"))
    wait_for_backend()
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    state: dict = {"_dtype": jnp.bfloat16, "device": str(dev)}
    # Insurance line: if the process is killed before the first leg's
    # watchdog fires, the driver still parses a (degraded) JSON record.
    print(json.dumps(assemble(state)), flush=True)

    legs = [
        ("encoder", 0.0, encoder_leg),
        # min-useful estimates assume a warm compile cache; a cold leg that
        # overruns only loses its own numbers — earlier lines already stand
        ("diffusion", 120.0, diffusion_leg),
    ]
    if os.environ.get("BENCH_SDXL", "1") != "0":
        legs.append(("sdxl", 300.0, sdxl_leg))
    run_legs(legs, state, deadline)


if __name__ == "__main__":
    main()
