"""Shared neural blocks for the SD model zoo (flax.linen, NHWC).

From-scratch TPU-native implementations of the architectural blocks the
reference consumes through diffusers' torch models (UNet2DConditionModel,
AutoencoderKL, CLIPTextModel — reference ``main.py:278-309``): timestep
embeddings, ResNet blocks, spatial transformers with self/cross attention,
and up/down sampling.

Design notes (TPU-first):
- NHWC everywhere — TPU conv layouts are channels-last; boundary code
  transposes once at entry/exit.
- Attention dispatches by sequence length (``scaled_attention``): short
  sequences use XLA's fused ``jax.nn.dot_product_attention``; long ones
  (T ≥ 2048) use a KV-chunked online-softmax scan that never materializes
  the S×T score matrix — the fused path is bandwidth-bound on those
  (53% of the 512² PGD step) and OOMs single-chip HBM at 1024².
- Submodule names deliberately mirror diffusers' state-dict names
  (``resnets_0``, ``attn1``, ``to_q``, …) so weight conversion in
  :mod:`~tml_image_editing_defense_tpu.models.convert` is a mechanical
  rename + transpose, never a re-architecture.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics;
    SD UNets use flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out.astype(dtype)


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP lifting the sinusoidal embedding to the model width."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class ResnetBlock(nn.Module):
    """GroupNorm→SiLU→Conv ×2 with additive time conditioning and a learned
    skip projection on channel change (diffusers ``ResnetBlock2D``)."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


@jax.checkpoint
def _remat_attention(q, k, v, mask):
    """Fused attention with rematerialized backward.

    The T×T score/prob matrices (4096² at 512² latents) are recomputed from
    q/k/v in the backward pass instead of being saved — without this, saving
    them across the K-step denoise scan costs gigabytes per step (measured:
    27 GB at 512², an OOM) and forces conv-recompute remat policies.  With
    attention internals never saved, the denoise scan can run with
    ``remat_policy='none'`` (save all conv/dense outputs) on one chip.
    Attention is a small share of step FLOPs at SD shapes — but NOT of step
    *time* at long T (bandwidth-bound score materialization), which is why
    ``scaled_attention`` routes T ≥ 2048 to the chunked path instead.
    """
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def _chunk_scan(q, k, v, kv_chunk: int, checkpoint_body: bool):
    """The online-softmax KV-chunk scan shared by :func:`_chunked_attention`
    (checkpointed body — autodiff recomputes each chunk in the backward) and
    :func:`_chunked_attention_fwd_lse` (plain body — the flash-2 custom VJP
    never differentiates through it).  ONE implementation on purpose: the
    custom-VJP contract promises forward numerics bit-identical between the
    two callers.  Returns the final ``(m, l, acc)`` f32 running stats."""
    b, t, h, d = q.shape
    s = k.shape[1]
    n = -(-s // kv_chunk)
    pad = n * kv_chunk - s
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    scale = 1.0 / math.sqrt(d)

    # K/V are sliced in place per chunk index — pre-stacking [n,B,C,H,D]
    # scan inputs costs a full K+V transpose copy and showed up as 23% of
    # the PGD step in dynamic-update-slice fusions.
    def body(carry, idx):
        m, l, acc = carry                                      # f32 running stats
        kcb = jax.lax.dynamic_slice_in_dim(k, idx * kv_chunk, kv_chunk, axis=1)
        vcb = jax.lax.dynamic_slice_in_dim(v, idx * kv_chunk, kv_chunk, axis=1)
        ok = idx * kv_chunk + jnp.arange(kv_chunk) < s
        # Logits deliberately leave the MXU in the INPUT dtype and are only
        # then upcast: with preferred_element_type=f32 the einsum's VJP
        # receives an f32 cotangent and the dQ/dK backward matmuls run as
        # f32 MXU ops — measured on-chip at 2.51 s/PGD-step vs 1.7 with the
        # bf16 path (MFU 24% vs 35%).  So on bf16 inputs the logits are
        # rounded to bf16 once before the f32 softmax/stats below; the
        # fused-path parity tests hold at 2e-2 in bf16 (exact in f32, where
        # the torch-oracle tests run).
        logits = (
            jnp.einsum("bthd,bchd->bthc", q, kcb).astype(jnp.float32) * scale
        )
        logits = jnp.where(ok[None, None, None, :], logits, -1e30)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bthc,bchd->bthd", p.astype(vcb.dtype), vcb
        ).astype(jnp.float32)
        return (m_new, l, acc), None

    if checkpoint_body:
        body = jax.checkpoint(body)
    m0 = jnp.full((b, t, h), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, t, h), jnp.float32)
    acc0 = jnp.zeros((b, t, h, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), jnp.arange(n))
    return m, l, acc


def _chunked_attention(q, k, v, kv_chunk: int):
    """Online-softmax attention over KV chunks (the FlashAttention
    recurrence, in pure jax) — the [B,H,T,S] score matrix is NEVER
    materialized, not even transiently in the backward pass.

    Remat'd fused attention still peaks at the full score matrix during the
    backward recompute: f32[2,10,4096,4096] = 1.25 GB per SDXL 64²-token
    layer, and 1 GB for the VAE's 16384-token mid attention at 1024² — the
    allocations that pushed the SDXL 1024² fwd+bwd program over v5e HBM.
    Here each scan step touches only a [B,T,H,C] slab (C = ``kv_chunk``)
    and the checkpointed body recomputes it per chunk in the backward.

    Numerics: softmax stats and accumulators in f32; on bf16 inputs the
    logits themselves round through bf16 once at the MXU boundary (see the
    in-kernel comment — keeping the einsum in the input dtype is what keeps
    the backward matmuls bf16; fused-path agreement is ~2e-2 in bf16 and
    exact in f32).
    """
    _, l, acc = _chunk_scan(q, k, v, kv_chunk, checkpoint_body=True)
    return (acc / l[..., None]).astype(q.dtype)


def _chunked_attention_fwd_lse(q, k, v, kv_chunk: int):
    """The same online-softmax chunk scan as :func:`_chunked_attention`
    (literally — see :func:`_chunk_scan`), additionally returning the
    log-sum-exp rows ``lse = m + log l`` ([B,T,H] f32) — the residual the
    flash-2 backward needs."""
    m, l, acc = _chunk_scan(q, k, v, kv_chunk, checkpoint_body=False)
    return (acc / l[..., None]).astype(q.dtype), m + jnp.log(l)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _chunked_attention_cv(q, k, v, kv_chunk: int):
    """:func:`_chunked_attention` with a hand-written flash-2 backward.

    ``jax.checkpoint`` around the chunk body makes autodiff replay the whole
    online-softmax forward (max/rescale chains and all) and then
    differentiate it — carrying f32 cotangents for m/l/acc through the
    scan.  The analytic backward (Dao, FlashAttention-2) instead saves only
    ``(o, lse)`` from the forward and per chunk recomputes the normalized
    probabilities ``p = exp(s − lse)`` directly, emitting

        dV_c = pᵀ·dO,   dS = p ∘ (dO·V_cᵀ − Δ),   Δ = rowsum(dO ∘ O),
        dQ  += dS·K_c,  dK_c = dSᵀ·Q

    — 5 matmuls/chunk vs the replay's ~6 plus the softmax-chain overhead.
    Forward numerics are bit-identical to :func:`_chunked_attention` (same
    scan, same input-dtype logits einsum — see the comment there); the
    backward is the exact gradient of that forward, computed in f32 stats
    with bf16 MXU matmuls, so it matches autodiff to bf16 rounding.
    """
    o, _ = _chunked_attention_fwd_lse(q, k, v, kv_chunk)
    return o


def _chunked_cv_fwd(q, k, v, kv_chunk):
    o, lse = _chunked_attention_fwd_lse(q, k, v, kv_chunk)
    return o, (q, k, v, o, lse)


def _chunked_cv_bwd(kv_chunk, res, g):
    q, k, v, o, lse = res
    b, t, h, d = q.shape
    s = k.shape[1]
    n = -(-s // kv_chunk)
    pad = n * kv_chunk - s
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    scale = 1.0 / math.sqrt(d)
    # Δ rows: f32, tiny.  p below is already normalized (exp(s − lse)).
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    g_in = g.astype(q.dtype)

    def body(dq_acc, idx):
        kcb = jax.lax.dynamic_slice_in_dim(k, idx * kv_chunk, kv_chunk, axis=1)
        vcb = jax.lax.dynamic_slice_in_dim(v, idx * kv_chunk, kv_chunk, axis=1)
        ok = idx * kv_chunk + jnp.arange(kv_chunk) < s
        logits = (
            jnp.einsum("bthd,bchd->bthc", q, kcb).astype(jnp.float32) * scale
        )
        logits = jnp.where(ok[None, None, None, :], logits, -1e30)
        p = jnp.exp(logits - lse[..., None])                   # f32, rows sum to 1
        dv_c = jnp.einsum("bthc,bthd->bchd", p.astype(g_in.dtype), g_in)
        dp = jnp.einsum("bthd,bchd->bthc", g_in, vcb).astype(jnp.float32)
        ds = (p * (dp - delta[..., None]) * scale).astype(q.dtype)
        dq_acc = dq_acc + jnp.einsum("bthc,bchd->bthd", ds, kcb).astype(
            jnp.float32
        )
        dk_c = jnp.einsum("bthc,bthd->bchd", ds, q)
        return dq_acc, (dk_c, dv_c)

    dq0 = jnp.zeros((b, t, h, d), jnp.float32)
    dq, (dk, dv) = jax.lax.scan(body, dq0, jnp.arange(n))
    # [n, B, C, H, D] → [B, n·C, H, D], drop pad rows
    dk = dk.transpose(1, 0, 2, 3, 4).reshape(b, n * kv_chunk, h, d)[:, :s]
    dv = dv.transpose(1, 0, 2, 3, 4).reshape(b, n * kv_chunk, h, d)[:, :s]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_chunked_attention_cv.defvjp(_chunked_cv_fwd, _chunked_cv_bwd)


#: Minimum KV length for the chunked path (tests lower it to exercise
#: chunking on tiny models).
MIN_CHUNKED_SEQ = 2048

#: Long-sequence attention implementation:
#:   "chunked_cv" — the online-softmax scan with the hand-written flash-2
#:                  backward above (default; measured fastest in-program),
#:   "chunked"    — same forward, jax.checkpoint-replay autodiff backward,
#:   "flash"      — jax's bundled Pallas TPU flash-attention kernel,
#:   "pallas"     — our custom Pallas kernel (ops/flash_attention.py).
#: Module state so perf experiments can flip it without re-plumbing configs
#: (override with env TID_ATTN_IMPL; in-program measurements in
#: docs/PERF.md decide the default).
import os as _os

LONG_ATTENTION_IMPL = _os.environ.get("TID_ATTN_IMPL", "chunked_cv")
#: Valid values for ``LONG_ATTENTION_IMPL`` / ``TID_ATTN_IMPL``.
_LONG_ATTENTION_IMPLS = ("chunked_cv", "chunked", "flash", "pallas")


def _flash_attention(q, k, v):
    """jax bundled Pallas TPU flash attention over [B,T,H,D] inputs.

    Head dims below 128 (SD-1.5 self-attn: 40/80) are lane-padded inside
    the kernel — extra MXU FLOPs on the QK/PV contractions, but the score
    matrix never touches HBM and the whole attention is one pipelined
    kernel with an analytic backward (vs the chunk scan's per-chunk
    recompute + dynamic-slice traffic)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    d = q.shape[-1]
    o = flash_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        sm_scale=1.0 / math.sqrt(d),
    )
    return o.transpose(0, 2, 1, 3)


def scaled_attention(q, k, v, mask=None, kv_chunk: Optional[int] = None):
    """Attention dispatcher: chunked online-softmax (or the Pallas flash
    kernel — ``LONG_ATTENTION_IMPL``) when ``kv_chunk`` is set and the KV
    axis is long enough to matter; XLA's fused path otherwise.

    The floor (S ≥ max(2·chunk, 2048)) keeps short sequences — cross-attn
    S=77, SDXL-at-512²'s T=1024 self-attn — on the fused kernel, where the
    score matrix is small and the scan would be pure overhead.  Long
    sequences are bandwidth-bound on the materialized S×T scores: at
    T=S=4096 the fused path measured 53% of the whole PGD step
    (bf16[2,8,4096,4096] = 536 MB per layer); chunking cut the step from
    2.42 → 1.74 s (docs/PERF.md).
    """
    if kv_chunk and mask is None and k.shape[1] >= max(2 * kv_chunk, MIN_CHUNKED_SEQ):
        impl = LONG_ATTENTION_IMPL
        if impl not in _LONG_ATTENTION_IMPLS:
            # the knob exists for perf measurements — a typo must not
            # silently record numbers from a different implementation
            raise ValueError(
                f"TID_ATTN_IMPL={impl!r} unknown; choose one of "
                f"{_LONG_ATTENTION_IMPLS}"
            )
        if impl == "flash" and q.shape[1] == k.shape[1]:
            return _flash_attention(q, k, v)
        if impl == "pallas":
            from tml_image_editing_defense_tpu.ops import flash_attention as _fa

            if _fa.supports(q.shape, k.shape[1], False):
                return _fa.flash_attention(q, k, v)
        if impl == "chunked":
            return _chunked_attention(q, k, v, kv_chunk)
        # default — also the fallback when flash/pallas don't support the shape
        return _chunked_attention_cv(q, k, v, kv_chunk)
    return _remat_attention(q, k, v, mask)


class Attention(nn.Module):
    """Multi-head attention over flattened spatial tokens (self or cross).

    Matches diffusers ``Attention`` parameterization: no-bias q/k/v, biased
    output projection.  Uses the XLA fused attention path.
    """

    heads: int
    dim_head: int
    cross_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    out_dim: Optional[int] = None
    kv_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None, mask=None):
        inner = self.heads * self.dim_head
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        b, t = q.shape[0], q.shape[1]
        s = k.shape[1]
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, s, self.heads, self.dim_head)
        v = v.reshape(b, s, self.heads, self.dim_head)
        o = scaled_attention(q, k, v, mask, kv_chunk=self.kv_chunk)
        o = o.reshape(b, t, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out_0")(o)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers ``FeedForward`` with geglu activation)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) gelu: diffusers' GEGLU calls torch F.gelu with the
        # default exact form; flax's tanh-approx default deviates ~4e-4.
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn→LN→cross-attn→LN→GEGLU-FF, all residual."""

    heads: int
    dim_head: int
    cross_dim: int
    dtype: jnp.dtype = jnp.float32
    kv_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.heads, self.dim_head, dtype=self.dtype,
                          kv_chunk=self.kv_chunk, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.heads, self.dim_head, cross_dim=self.cross_dim, dtype=self.dtype,
            kv_chunk=self.kv_chunk, name="attn2"
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN → linear proj-in → N transformer blocks →
    linear proj-out, residual (diffusers ``Transformer2DModel`` with
    ``use_linear_projection`` matching the model family)."""

    heads: int
    dim_head: int
    cross_dim: int
    depth: int = 1
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    kv_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(self.heads * self.dim_head, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(self.heads * self.dim_head, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, self.heads * self.dim_head)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, self.cross_dim, dtype=self.dtype,
                kv_chunk=self.kv_chunk, name=f"transformer_blocks_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, self.heads * self.dim_head)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class SelfAttentionBlock(nn.Module):
    """Single-head-per-channel-group spatial self-attention used in the VAE
    mid block (diffusers ``AttnProcessor`` on ``AttentionBlock``)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    kv_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        o = scaled_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], None,
            kv_chunk=self.kv_chunk,
        )
        o = o.reshape(b, h * w, c)
        o = nn.Dense(c, dtype=self.dtype, name="to_out_0")(o)
        return res + o.reshape(b, h, w, c)
