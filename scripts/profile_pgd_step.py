#!/usr/bin/env python
"""Profile the diffusion PGD step in-program and print the top device ops.

Captures a ``jax.profiler`` trace of 2 steady-state steps, then aggregates
the TPU track of the dumped ``trace.json.gz`` by event name — the same
methodology as the round-2 profile that found the 53% attention share
(isolated microbenchmarks are floor-bound on this setup; PERF.md).

Usage: python scripts/profile_pgd_step.py [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default="/tmp/tid_trace_r3")
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl"],
                    help="profile the SD-1.5 or the SDXL@512 bench-leg step")
    ap.add_argument("--attn-chunk", default="512",
                    help="attn_kv_chunk for the build: an int or 'none' (fused)")
    args = ap.parse_args()

    from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
    from tml_image_editing_defense_tpu.configs import TrainConfig
    from tml_image_editing_defense_tpu.core.rng import make_noise_pool
    from tml_image_editing_defense_tpu.core.samplers import LCMSampler
    from tml_image_editing_defense_tpu.models import build_model

    dtype = jnp.bfloat16
    chunk = None if args.attn_chunk == "none" else int(args.attn_chunk)
    model = build_model(args.family, key=jax.random.key(0), dtype=dtype,
                        image_size=512, fast_init=True, attn_kv_chunk=chunk)
    src = jnp.clip(jax.random.normal(jax.random.key(1), (1, 512, 512, 3),
                                     jnp.float32) * 0.4, -1, 1).astype(dtype)
    cfg = TrainConfig(norm_type="l2", n_denoising_steps_per_iteration=4,
                      limit_timesteps=True, guidance_scale=3.0, use_lcm=True,
                      use_sdxl=args.family == "sdxl",
                      image_size=512, dtype="bfloat16", eot_mode="scan",
                      remat_policy="none")
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(4, limit_t=700)
    n_bank = 8 if args.family == "sd15" else 4      # match the bench legs
    bank = model.embed_prompt_bank([p + ", detailed" for p in cfg.prompts[:n_bank]])
    pool = make_noise_pool(jax.random.key(2), cfg.n_noise, model.latent_shape, dtype)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    x, _ = step(model.params, src, data, _mkey(3))
    _sync(x)
    t0 = time.time()
    x, _ = step(model.params, x, data, _mkey(4))
    _sync(x)
    log(f"steady-state step {time.time() - t0:.3f}s; tracing 2 steps…")

    jax.profiler.start_trace(args.trace_dir)
    for i in range(2):
        x, _ = step(model.params, x, data, _mkey(10 + i))
    _sync(x)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(args.trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        log("no trace.json.gz found; dumping dir listing")
        for p in glob.glob(args.trace_dir + "/**", recursive=True):
            log(p)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pick pids whose process name mentions TPU/device, and
    # within them ONLY the flat "XLA Ops" thread — outer threads carry
    # nested module/step spans that double-count
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    op_tids = {k for k, n in tid_names.items()
               if k[0] in dev_pids and "ops" in n.lower()}
    log(f"device pids {sorted(dev_pids)}; op threads "
        f"{[(k, tid_names[k]) for k in sorted(op_tids)]}")
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            total += dur
    log(f"{total/1e6:.3f}s total op time over 2 steps")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    out = [{"op": k[:120], "ms": round(v / 1e3, 2),
            "pct": round(100 * v / total, 1)} for k, v in rows]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
