"""Shared model-zoo building blocks: configs, quantized linears, attention.

Functional JAX re-design of the reference's model-surgery layer
(model/qLinearLayer.py, model/qLlamaLayer.py, …): instead of mutating HF
modules in place, models here are pure functions over parameter pytrees.
Quantization is a *load-time weight transform* plus *fused activation ops*:

  * each decoder layer has one quantize site per distinct activation
    (attn input shared by q/k/v, o input, mlp input shared by gate/up,
    down input) — the quantize-once / feed-many structure the reference's
    Mixtral path intended (SURVEY §2.2 version-skew note)
  * the down_proj channel permutation is baked into gate/up weight ROWS,
    so silu·mul needs no runtime gather (activate.cu:42-202 equivalent)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels.mixed_matmul import mixed_matmul
from ..mx.mxtensor import MixedTensor, dequantize_mixed
from ..ops.quantize_ops import (
    reorder_quantize_x,
    rmsnorm_quantize_x,
    silu_mul_quantize_x,
)

# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Covers Llama 3.x, Qwen2/2.5 and Mixtral decoder architectures."""

    arch: str  # "llama" | "qwen2" | "mixtral"
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False            # Qwen2: True
    tie_embeddings: bool = False
    sliding_window: Optional[int] = None  # Qwen2 optional
    num_experts: int = 0              # Mixtral: 8
    num_experts_per_tok: int = 0      # Mixtral: 2
    # None -> dense dispatch (every expert on every token, exact);
    # float -> fixed-capacity token dispatch: each expert processes at most
    # ceil(T * top_k / E * factor) tokens (GShard/Switch semantics; tokens
    # over capacity are dropped for that expert).  factor >= E/top_k means
    # capacity >= T: no drops, numerics match dense dispatch.
    moe_capacity_factor: Optional[float] = None
    max_position_embeddings: int = 32768
    # RoPE frequency scaling (Llama 3.1+ checkpoints):
    #   ("llama3", factor, low_freq_factor, high_freq_factor, orig_max_pos)
    #   ("linear", factor)
    rope_scaling: Optional[Tuple] = None

    def __post_init__(self):
        if self.rope_scaling is not None:
            # JSON round-trips tuples as lists; normalize for equality
            object.__setattr__(self, "rope_scaling",
                               tuple(self.rope_scaling))

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0


# ---------------------------------------------------------------------------
# Linear containers
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QuantLinear:
    """MX-quantized linear: packed weight segments + optional bf16 bias.

    Equivalent of QLinearLayer (model/qLinearLayer.py:20-74) minus the
    per-call quantize — activations arrive pre-quantized (MixedTensor).
    """

    # (out_features, K) quantized: split-plane MixedTensor or the
    # decode-optimized ScaledW8 layout (mx/scaledw8.py)
    w: Any
    bias: Optional[jnp.ndarray] = None

    def __call__(self, qx) -> jnp.ndarray:
        """qx: MixedTensor, or its exact bf16 image when w is ScaledW8."""
        y = mixed_matmul(qx, self.w)
        if self.bias is not None:
            y = y + self.bias
        return y


jax.tree_util.register_dataclass(QuantLinear, data_fields=["w", "bias"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class WeightOnlyLinear:
    """Weight-only MX quantization: packed MX weight, bf16 activations.

    BASELINE.md config 1 (MXFP8 weight-only): no activation quantization,
    no calibration needed — the weight is dequantized to exact bf16 in the
    matmul (one-shot on the MXU path).  4-8x weight HBM saving with near-
    lossless accuracy; the on-ramp mode before full mixed-precision.
    """

    # (out_features, K) quantized: MixedTensor (any MX format), or a
    # CANONICAL-column-order ScaledW8 for the mxfp4 decode-optimized
    # layout (activations are plain bf16 here, so no block interleave)
    w: Any
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..mx.scaledw8 import ScaledW8
        if isinstance(self.w, ScaledW8):
            lead = x.shape[:-1]
            y = mixed_matmul(x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16),
                             self.w)
            y = y.reshape(*lead, y.shape[-1])
        else:
            wd = dequantize_mixed(self.w, dtype=jnp.bfloat16)
            y = jnp.dot(x, wd.T, preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(jnp.bfloat16)


jax.tree_util.register_dataclass(WeightOnlyLinear,
                                 data_fields=["w", "bias"], meta_fields=[])


@dataclasses.dataclass(frozen=True)
class Int8TurboLinear:
    """W8A8 per-channel int8 linear on the s8 MXU path — TURBO EXTENSION.

    NOT MicroMix numerics (no MX blocks, no mixed precision): symmetric
    per-output-channel int8 weights + dynamic per-row int8 activations,
    contracted on the v5e int8 MXU (~2x the bf16 rate; measured 804 TOPs
    vs 191 TFLOPs at M=2048 in-loop).  Offered as a clearly-labeled
    out-of-spec speed mode; accuracy claims follow W8A8/SmoothQuant
    literature, not the MicroMix paper.
    """

    w: jnp.ndarray                  # (N, K) int8
    w_scale: jnp.ndarray            # (N,) f32 per-output-channel
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        xf = x.astype(jnp.float32)
        sa = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sa = jnp.maximum(sa, 1e-12)
        xq = jnp.clip(jnp.round(xf / sa), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, self.w, dimension_numbers=(((xq.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sa * self.w_scale
        if self.bias is not None:
            y = y + self.bias
        return y.astype(jnp.bfloat16)


jax.tree_util.register_dataclass(Int8TurboLinear,
                                 data_fields=["w", "w_scale", "bias"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class DenseLinear:
    """bf16 reference linear (quantization off, for A/B numeric testing)."""

    w: jnp.ndarray       # (out_features, in_features)
    bias: Optional[jnp.ndarray] = None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.dot(x, self.w.T, preferred_element_type=jnp.float32)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(jnp.bfloat16)


jax.tree_util.register_dataclass(DenseLinear, data_fields=["w", "bias"],
                                 meta_fields=[])


@dataclasses.dataclass(frozen=True)
class QuantSite:
    """One activation-quantization site: composed gather + segment split.

    ``perm`` maps device-layout position -> source channel; it composes the
    calibration reorder_index with the per-segment block interleave
    (mx/layout.py compose_segmented).  ``None`` perm means the producer
    already emits device layout (down_proj input).
    """

    k4: int = dataclasses.field(metadata=dict(static=True))
    k6: int = dataclasses.field(metadata=dict(static=True))
    k8: int = dataclasses.field(metadata=dict(static=True))
    perm: Optional[jnp.ndarray] = None
    # (K,) i32 bit-packed Benes route equal to ``perm`` (mx/benes.py),
    # present when K is a power of two: the decode path's fused site
    # kernel gathers in-kernel via static roll+select stages instead of
    # the XLA transpose+gather chain (2.9 ms/step at 8B, perf_notes r4)
    benes: Optional[jnp.ndarray] = None

    @property
    def splits(self):
        return (self.k4, self.k6, self.k8)


jax.tree_util.register_dataclass(QuantSite, data_fields=["perm", "benes"],
                                 meta_fields=["k4", "k6", "k8"])


# ---------------------------------------------------------------------------
# Elementary ops (bf16 path)
# ---------------------------------------------------------------------------


def rmsnorm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    rvar = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * rvar * g.astype(jnp.float32)).astype(jnp.bfloat16)


def quantize_int_group(x: jnp.ndarray, nbits: int = 4,
                       group_size: int = 128) -> jnp.ndarray:
    """Asymmetric int-group fake quantization (KV-cache accuracy mode).

    Matches quantize_int_group (qLlamaLayer.py:12-23): per-group [min,max]
    asymmetric uint grid, round-half-even, clamp, dequantize.
    """
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(-1, group_size)
    gmax = jnp.max(xf, axis=-1, keepdims=True)
    gmin = jnp.min(xf, axis=-1, keepdims=True)
    qmax = float(2 ** nbits - 1)
    scales = jnp.maximum(gmax - gmin, 1e-5) / qmax
    base = jnp.clip(jnp.round(-gmin / scales), 0.0, qmax)
    q = jnp.clip(jnp.round(xf / scales) + base, 0.0, qmax)
    return ((q - base) * scales).reshape(shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# RoPE (half-rotation layout, as Llama/Qwen/Mixtral use)
# ---------------------------------------------------------------------------


def rope_inv_freq(head_dim: int, theta: float,
                  rope_scaling: Optional[Tuple] = None) -> jnp.ndarray:
    """Per-pair inverse frequencies (head_dim//2,), with optional scaling.

    "llama3" implements HF's _compute_llama3_parameters rule (Llama 3.1+
    checkpoints ship rope_scaling; ignoring it breaks long-range numerics).
    """
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    if rope_scaling is None:
        return inv
    kind = rope_scaling[0]
    if kind == "linear":
        return inv / float(rope_scaling[1])
    if kind == "llama3":
        _, factor, low_f, high_f, orig_max = rope_scaling
        factor, low_f, high_f = float(factor), float(low_f), float(high_f)
        orig_max = float(orig_max)
        wavelen = 2.0 * jnp.pi / inv
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        smoothed = (1.0 - smooth) * inv / factor + smooth * inv
        return jnp.where(wavelen < high_wl, inv,
                         jnp.where(wavelen > low_wl, inv / factor, smoothed))
    raise ValueError(f"unsupported rope_scaling kind {kind!r}")


def rope_table(positions: jnp.ndarray, head_dim: int, theta: float,
               rope_scaling: Optional[Tuple] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions (S,) -> (cos, sin) each (S, head_dim)."""
    inv = rope_inv_freq(head_dim, theta, rope_scaling)
    freqs = positions.astype(jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, S, H, D), cos/sin (S, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s
            ).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention (full-sequence, causal; bf16 math like the reference's SDPA path)
# ---------------------------------------------------------------------------


def causal_mask(s_q: int, s_k: int, sliding_window: Optional[int] = None,
                offset: int = 0) -> jnp.ndarray:
    """(s_q, s_k) bool mask; True = attend.  offset = s_k - s_q alignment."""
    qi = jnp.arange(s_q)[:, None] + offset
    ki = jnp.arange(s_k)[None, :]
    m = ki <= qi
    if sliding_window is not None:
        m = jnp.logical_and(m, ki > qi - sliding_window)
    return m


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """q (B,S,H,D), k/v (B,T,Hkv,D) -> (B,S,H,D).  GQA via head repeat."""
    b, s, h, d = q.shape
    hkv = k.shape[2]
    rep = h // hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / jnp.sqrt(float(d))
    scores = jnp.where(mask[None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v)
    return out


# ---------------------------------------------------------------------------
# Quantized / dense linear application with shared input quantization
# ---------------------------------------------------------------------------

# Decode-path switch: run each activation site INSIDE its first consumer's
# ScaledW8 GEMM (kernels/mixed_matmul.mixed_matmul_w8_site) instead of as a
# separate Pallas site call.  Module-level so ablation probes can flip it.
FUSE_SITE_GEMM = True
# Ablation probes ONLY (timing, wrong values): skip the runtime channel
# gather at quantize sites — XLA lowers the constant-perm jnp.take as a
# transpose + row-gather + transpose chain, 3 sites x 32 layers per
# decode step (benchmarks/probe_ablate.py --no-perm measures it).
SKIP_SITE_PERM = False


def project_all(x: jnp.ndarray, site: Optional[QuantSite], linears,
                norm_gamma: Optional[jnp.ndarray] = None,
                rms_eps: float = 1e-6, stack=None):
    """Apply [norm ->] [quantize ->] each linear in ``linears`` to x.

    x: (..., K).  Returns list of (..., N_i).
    Quantized path: one fused rmsnorm/reorder+quantize, then one segmented
    matmul per consumer (the quantize-once optimization).

    ``stack`` (ScaledW8Stack): the site's consumers pre-stacked row-wise
    (models/surgery.stack_layer_projections).  When given, ``linears`` is
    ignored (may be None): the decode path runs site + ALL consumer GEMMs
    as ONE multi-output Pallas call (kernels/mixed_matmul.
    mixed_matmul_w8_stack); the prefill path dequantizes the stack once
    and runs one wide MXU dot.  Bit-identical to the per-linear path.
    """
    lead = x.shape[:-1]
    if stack is not None:
        return _project_stack(x, site, stack, norm_gamma, rms_eps, lead)
    quantized = isinstance(linears[0], QuantLinear)
    if not quantized:
        xn = rmsnorm(x, norm_gamma, rms_eps) if norm_gamma is not None else x
        return [lin(xn) for lin in linears]
    from .hetero import FakeQuantSite, fakequant_site, rmsnorm_fakequant
    if isinstance(site, FakeQuantSite):
        # heterogeneous-budget path (models/hetero.py): budgets are data,
        # quantization goes straight to the exact bf16 grid image
        # (rmsnorm_fakequant holds the no-intermediate-bf16-round rule).
        qx = (rmsnorm_fakequant(x, norm_gamma, site, rms_eps)
              if norm_gamma is not None
              else fakequant_site(x, site)).reshape(-1, x.shape[-1])
        return [lin(qx).reshape(*lead, -1) for lin in linears]
    from ..mx.scaledw8 import ScaledW8
    if all(isinstance(lin.w, ScaledW8) for lin in linears):
        # fakequant-direct: ScaledW8 consumers eat the exact bf16 image of
        # the quantized activation, so skip encoding codes entirely —
        # identical values, ~half the per-site ops in the decode scan
        from ..ops.quantize_ops import (
            _use_site_kernel, reorder_fakequant_x, rmsnorm_fakequant_x)
        x2d = x.reshape(-1, x.shape[-1])
        if FUSE_SITE_GEMM and _use_site_kernel(x2d):
            # decode path: the site fakequant runs INSIDE the first
            # consumer's GEMM (one Pallas call), which re-emits the bf16
            # image for the sibling consumers (quantize-once across
            # q/k/v and gate/up) — bit-identical to the unfused pair
            from ..kernels.mixed_matmul import mixed_matmul_w8_site
            assert linears[0].w.segments() == site.splits, \
                (linears[0].w.segments(), site.splits)
            kw = {}
            if (site.perm is not None and site.benes is not None
                    and not SKIP_SITE_PERM):
                # in-kernel Benes gather: x and gamma go in UNPERMUTED
                xg = x2d
                kw["benes"] = site.benes
            else:
                xg = (jnp.take(x2d, site.perm, axis=1)
                      if site.perm is not None and not SKIP_SITE_PERM
                      else x2d)
            if norm_gamma is not None:
                g32 = norm_gamma.astype(jnp.float32)
                if (site.perm is not None and not SKIP_SITE_PERM
                        and "benes" not in kw):
                    g32 = jnp.take(g32, site.perm, axis=0)
                kw.update(producer="rms", gamma=g32, eps=rms_eps)
            first, rest = linears[0], linears[1:]
            if rest:
                y0, qx = mixed_matmul_w8_site(xg, first.w, emit_qx=True,
                                              **kw)
            else:
                y0 = mixed_matmul_w8_site(xg, first.w, **kw)
            if first.bias is not None:
                y0 = y0 + first.bias
            outs = [y0.reshape(*lead, y0.shape[-1])]
            for lin in rest:
                y = lin(qx)
                outs.append(y.reshape(*lead, y.shape[-1]))
            return outs
        if norm_gamma is not None:
            qx = rmsnorm_fakequant_x(x, norm_gamma, site.perm,
                                     *site.splits, eps=rms_eps)
        else:
            qx = reorder_fakequant_x(x, site.perm, *site.splits)
    elif _sp_fusable(linears):
        # split-plane decode path (capacity-first layout): single-consumer
        # sites (o_proj) wrap inline into a no-copy SplitPlaneStack so the
        # fused SP site kernel runs — the ScaledW8 glue, capacity layout
        # (multi-consumer SP sites get engine-built stacks instead)
        from ..mx.mxtensor import stack_split_plane
        st = stack_split_plane([linears[0].w], [linears[0].bias])
        return _project_stack(x, site, st, norm_gamma, rms_eps, lead)
    elif norm_gamma is not None:
        qx = rmsnorm_quantize_x(x, norm_gamma, site.perm, *site.splits,
                                eps=rms_eps)
    else:
        qx = reorder_quantize_x(x, site.perm, *site.splits)
    outs = []
    for lin in linears:
        y = lin(qx)
        outs.append(y.reshape(*lead, y.shape[-1]))
    return outs


def _sp_fusable(linears) -> bool:
    """True when a single split-plane consumer can wrap into a no-copy
    SplitPlaneStack (rows already 128-aligned, fp4 plane-packed)."""
    from ..mx.mxtensor import MixedTensor
    if len(linears) != 1 or not isinstance(linears[0].w, MixedTensor):
        return False
    w = linears[0].w
    return (w.fp4_packed or w.k4 == 0) and w.rows % 128 == 0


def _project_stack(x, site, stack, norm_gamma, rms_eps, lead):
    """project_all's stacked-weights leg (ScaledW8Stack or
    SplitPlaneStack): one multi-output call at decode M, one dequant +
    wide dot at prefill M.  Values match the per-linear path bit-for-bit
    (same site image, same decode, same f32 accumulation per consumer)."""
    from ..kernels.mixed_matmul import (
        mixed_matmul_sp_stack, mixed_matmul_w8_stack)
    from ..mx.mxtensor import SplitPlaneStack, dequantize_mixed_device
    from ..mx.scaledw8 import dequantize_stack
    from ..ops.quantize_ops import (
        _use_site_kernel, reorder_fakequant_x, rmsnorm_fakequant_x)
    assert stack.segments() == site.splits, (stack.segments(), site.splits)
    split_plane = isinstance(stack, SplitPlaneStack)
    x2d = x.reshape(-1, x.shape[-1])
    if FUSE_SITE_GEMM and _use_site_kernel(x2d):
        kw = {}
        if (site.perm is not None and site.benes is not None
                and not SKIP_SITE_PERM):
            xg = x2d
            kw["benes"] = site.benes
        else:
            xg = (jnp.take(x2d, site.perm, axis=1)
                  if site.perm is not None and not SKIP_SITE_PERM else x2d)
        if norm_gamma is not None:
            g32 = norm_gamma.astype(jnp.float32)
            if (site.perm is not None and not SKIP_SITE_PERM
                    and "benes" not in kw):
                g32 = jnp.take(g32, site.perm, axis=0)
            kw.update(producer="rms", gamma=g32, eps=rms_eps)
        fn = mixed_matmul_sp_stack if split_plane else mixed_matmul_w8_stack
        outs = fn(xg, stack, **kw)
    else:
        if norm_gamma is not None:
            qx = rmsnorm_fakequant_x(x2d, norm_gamma, site.perm,
                                     *site.splits, eps=rms_eps)
        else:
            qx = reorder_fakequant_x(x2d, site.perm, *site.splits)
        wd = (dequantize_mixed_device(stack.mt, jnp.bfloat16)
              if split_plane else dequantize_stack(stack))
        y = jnp.dot(qx, wd.T, preferred_element_type=jnp.float32
                    ).astype(jnp.bfloat16)
        outs, off = [], 0
        for n, p in zip(stack.sections, stack.padded):
            outs.append(y[:, off:off + n])
            off += p
    outs = [o if b is None else o + b for o, b in zip(outs, stack.biases)]
    return [o.reshape(*lead, o.shape[-1]) for o in outs]
