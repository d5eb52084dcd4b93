#!/usr/bin/env python
"""Amortized on-chip microbench of long-attention impls at SD shapes.

Isolated single-op timings sit on the ~30 ms dispatch floor (PERF.md), so
this scans N fwd+bwd attention evaluations inside ONE jitted program with
data varied per iteration — amortized per-op cost, same in-jit context as
the PGD step's denoise scan.

Usage: python scripts/probe_flash_kernel.py [--impls chunked pallas]
       [--shape 2,4096,8,40] [--iters 50] [--fwd-only]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
# reliable completion-wait: block_until_ready is a no-op on the async
# axon plugin; only host value fetches wait (docs/PERF.md measurement gotchas)
from tml_image_editing_defense_tpu.utils.profiling import sync as _sync


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", nargs="*", default=["chunked", "pallas"])
    ap.add_argument("--shape", default="2,4096,8,40")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--block", type=int, default=0)
    args = ap.parse_args()
    shape = tuple(int(x) for x in args.shape.split(","))
    b, t, h, d = shape

    import tml_image_editing_defense_tpu.ops.flash_attention as FA
    if args.block:
        FA._BLOCK = args.block
    from tml_image_editing_defense_tpu.models.layers import _chunked_attention

    def get_fn(impl):
        if impl == "chunked":
            att = lambda q, k, v: _chunked_attention(q, k, v, 512)
        elif impl == "pallas":
            att = FA.flash_attention
        elif impl == "fused":
            att = lambda q, k, v: jax.nn.dot_product_attention(q, k, v)
        else:
            raise ValueError(impl)
        if args.fwd_only:
            def body(carry, x):
                o = att(carry, x[0], x[1])
                return o, ()
        else:
            def body(carry, x):
                def loss(q, k, v):
                    return jnp.sum(att(q, k, v).astype(jnp.float32) ** 2)
                g = jax.grad(loss, argnums=(0, 1, 2))(carry, x[0], x[1])
                return carry + g[0].astype(carry.dtype) * 1e-6, ()

        @jax.jit
        def run(q, kvs):
            out, _ = jax.lax.scan(body, q, kvs)
            return out
        return run

    # salt the data per process: the axon execution cache is server-side and
    # persists ACROSS processes, so deterministic inputs replay cached
    # executions and measure nothing (PERF.md gotcha, extended)
    import os as _os

    salt = int.from_bytes(_os.urandom(4), "little")
    k1, k2 = jax.random.split(jax.random.key(salt))
    q = jax.random.normal(k1, shape, jnp.bfloat16)
    kvs = jax.random.normal(k2, (args.iters, 2) + shape, jnp.bfloat16)
    results = {}
    for impl in args.impls:
        run = get_fn(impl)
        try:
            t0 = time.time()
            o = run(q, kvs)
            _sync(o)
            log(f"[{impl}] compile+first {time.time()-t0:.1f}s")
            times = []
            for rep in range(3):
                # fresh random DATA per rep — scaling by (1+1e-6) rounds to
                # exactly 1.0 in bf16, leaving inputs bit-identical, and the
                # axon runtime then (sometimes) replays the cached execution;
                # median, not min, so stray cache hits can't win
                kvs2 = jax.random.normal(
                    jax.random.fold_in(k2, rep + 1), kvs.shape, kvs.dtype)
                _sync(kvs2)
                t0 = time.time()
                o = run(q, kvs2)
                _sync(o)
                times.append(time.time() - t0)
            per = sorted(times)[1] / args.iters * 1e3
            results[impl] = round(per, 3)
            log(f"[{impl}] {per:.3f} ms per fwd{'' if args.fwd_only else '+bwd'}")
        except Exception as e:
            log(f"[{impl}] FAILED {type(e).__name__}: {str(e)[:300]}")
            results[impl] = "error"
    print({"shape": shape, "fwd_only": args.fwd_only, "ms_per_iter": results})


if __name__ == "__main__":
    main()
