"""Model surgery: dense bf16 parameter pytree -> MX-quantized pytree.

Functional equivalent of reorder_model_llama/qwen/mixtral
(model/model_utils.py:19-101) + QLinearLayer.__init__'s weight quantization
(qLinearLayer.py:40-50): channel-permute every linear's input axis by its
calibration reorder index, quantize the weight (MXFP4 for all segments in
the default mode), pack, and record the composed activation gather.

Layout contract: weights are gathered with the *canonical* reorder index and
quantized by mx.quantize_mixed, which emits the block-interleaved device
layout itself; activation sites store the reorder index *composed* with the
per-segment interleave (mx/layout.py) so the runtime gather lands directly
in device layout.  Both sides therefore agree on scale-block membership
(the reference's consecutive-saliency 32-blocks) and on physical order.

TPU-first differences from the reference:
  * the down_proj input permutation is baked into gate/up (and Mixtral
    w1/w3) weight ROWS, so the silu·mul epilogue needs no runtime gather
    (the fused activate_quantize path the reference left disconnected)
  * weights are quantized once at load by the XLA path — no runtime weight
    quantize kernels; persistence via orbax is a separate concern
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..mx import layout as lay
from ..mx.formats import SEGMENT_ALIGN
from ..mx.mxtensor import quantize_mixed
from .common import DenseLinear, ModelConfig, QuantLinear, QuantSite

ATTN_IN = "attn_in"    # -> q, k, v
O_IN = "o_in"          # -> o_proj
MLP_IN = "mlp_in"      # -> gate, up  (Mixtral: per-expert w1, w3)
DOWN_IN = "down_in"    # -> down_proj (Mixtral: per-expert w2)


@dataclasses.dataclass
class SiteCalibration:
    """Calibration artifact for one quantization site.

    reorder_index: (K,) original-channel index per sorted position
    (ascending saliency, reorder_indices.py:64-69); p6/p8 multiples of 128
    (reorder_indices.py:109-110).
    """

    reorder_index: np.ndarray
    p6_num: int
    p8_num: int

    def splits(self, k: int) -> Tuple[int, int, int]:
        k4 = k - self.p6_num - self.p8_num
        assert 0 <= k4 <= k, (k, self.p6_num, self.p8_num)
        return (k4, self.p6_num, self.p8_num)


def identity_calibration(k: int, p6: int = 0, p8: int = 0) -> SiteCalibration:
    return SiteCalibration(np.arange(k, dtype=np.int32), int(p6), int(p8))


LayerCalib = Dict[str, SiteCalibration]


def make_site(calib: SiteCalibration, k: int) -> QuantSite:
    k4, k6, k8 = calib.splits(k)
    dev_perm = lay.compose_segmented(calib.reorder_index, k4, k6, k8)
    benes = None
    if k >= 2 and (k & (k - 1)) == 0:
        # power-of-two K: precompute the Benes route so the decode-path
        # site kernel gathers in-kernel (QuantSite.benes docstring)
        from ..mx.benes import benes_route, pack_masks
        _, masks = benes_route(np.asarray(dev_perm))
        benes = jnp.asarray(pack_masks(masks))
    return QuantSite(k4=k4, k6=k6, k8=k8, perm=jnp.asarray(dev_perm),
                     benes=benes)


def _maybe_scaledw8(wq, layout: str):
    """fp4-only MixedTensor -> ScaledW8 when the layout allows it.

    "auto" converts fp4-only weights to the decode-optimized per-element
    layout (kernels/mixed_matmul._w8_kernel: 12.9 -> 31.3 TFLOPs at decode
    M) and falls back to split-plane when the scaled-exponent span exceeds
    the 6-bit field (never seen on real weights).  "splitplane" keeps the
    packed MixedTensor (half the HBM bytes — the capacity-first choice).
    """
    if layout == "splitplane" or not wq.fp4_only:
        return wq
    assert layout == "auto", layout
    from ..mx.scaledw8 import pack_scaled_w8
    try:
        return pack_scaled_w8(wq, check=True)
    except ValueError:
        return wq


def quantize_linear(w: jnp.ndarray, calib: SiteCalibration,
                    bias: Optional[jnp.ndarray] = None, *,
                    weight_fp4_only: bool = True,
                    row_perm: Optional[np.ndarray] = None,
                    host: bool = False,
                    layout: str = "auto") -> QuantLinear:
    """w (N, K) dense -> QuantLinear (input channels permuted + quantized).

    host=True quantizes on the CPU via the native mxpack library (bit-
    identical; preferred for multi-GB checkpoints so the f32 weights never
    touch device HBM).  ``layout`` picks the device weight layout
    ("auto" -> ScaledW8 for fp4-only weights, "splitplane" -> packed).
    """
    n, k = w.shape
    k4, k6, k8 = calib.splits(k)
    if host:
        from ..mx.mxtensor import MixedTensor
        from ..utils.native import quantize_mixed_host
        wp = np.asarray(w, np.float32)[:, np.asarray(calib.reorder_index)]
        if row_perm is not None:
            wp = wp[np.asarray(row_perm)]
            if bias is not None:
                bias = jnp.take(bias, jnp.asarray(row_perm, jnp.int32), axis=0)
        bias_b = None if bias is None else bias.astype(jnp.bfloat16)
        if layout == "auto" and weight_fp4_only:
            # fused native quantize+pack (multithreaded C++): one u8 upload
            # per tensor; the numpy pack is the no-compiler fallback
            from ..mx.scaledw8 import ScaledW8, pack_scaled_w8_host
            from ..utils.native import quantize_scaledw8_host
            got = quantize_scaledw8_host(wp, k4, k6, k8)
            if got is not None:
                codes, base = got
                return QuantLinear(
                    w=ScaledW8(codes=jnp.asarray(codes),
                               base=jnp.full((1, 1), base, jnp.int32),
                               k4=k4, k6=k6, k8=k8),
                    bias=bias_b)
            segs = quantize_mixed_host(wp, k4, k6, k8,
                                       weight_fp4_only=weight_fp4_only)
            try:
                return QuantLinear(w=pack_scaled_w8_host(segs, k4, k6, k8),
                                   bias=bias_b)
            except ValueError:
                pass  # exponent span too wide: fall back to split-plane
        else:
            segs = None
        if segs is None:
            segs = quantize_mixed_host(wp, k4, k6, k8,
                                       weight_fp4_only=weight_fp4_only)
        wq = MixedTensor(
            fp4=jnp.asarray(segs["fp4"]), fp6=jnp.asarray(segs["fp6"]),
            fp8=jnp.asarray(segs["fp8"]), sf4=jnp.asarray(segs["sf4"]),
            sf6=jnp.asarray(segs["sf6"]), sf8=jnp.asarray(segs["sf8"]),
            fp4_packed=bool(k4), fp4_only=weight_fp4_only)
        # reached only when ScaledW8 was skipped or failed: keep split-plane
        return QuantLinear(w=wq, bias=bias_b)
    wp = jnp.take(w.astype(jnp.float32),
                  jnp.asarray(calib.reorder_index, dtype=jnp.int32), axis=1)
    if row_perm is not None:
        wp = jnp.take(wp, jnp.asarray(row_perm, dtype=jnp.int32), axis=0)
        if bias is not None:
            bias = jnp.take(bias, jnp.asarray(row_perm, dtype=jnp.int32),
                            axis=0)
    wq = quantize_mixed(wp, k4, k6, k8, weight_fp4_only=weight_fp4_only,
                        pack_fp4=True)
    return QuantLinear(
        w=_maybe_scaledw8(wq, layout),
        bias=None if bias is None else bias.astype(jnp.bfloat16))


def _down_row_perm(calib: SiteCalibration, k: int) -> np.ndarray:
    """Row permutation for gate/up so silu·mul output is in device layout."""
    k4, k6, k8 = calib.splits(k)
    return lay.compose_segmented(calib.reorder_index, k4, k6, k8)


def quantize_layer(p: Dict[str, Any], cfg: ModelConfig,
                   calib: LayerCalib, *,
                   weight_fp4_only: bool = True,
                   host: bool = False,
                   layout: str = "auto") -> Dict[str, Any]:
    """One dense decoder-layer param dict -> quantized param dict."""
    out: Dict[str, Any] = {"ln1": p["ln1"], "ln2": p["ln2"]}
    hid = cfg.hidden_size

    c_attn = calib[ATTN_IN]
    out["attn_site"] = make_site(c_attn, hid)
    for name in ("q", "k", "v"):
        lin: DenseLinear = p[name]
        out[name] = quantize_linear(lin.w, c_attn, lin.bias,
                                    weight_fp4_only=weight_fp4_only, host=host, layout=layout)

    c_o = calib[O_IN]
    out["o_site"] = make_site(c_o, cfg.num_heads * cfg.head_dim)
    out["o"] = quantize_linear(p["o"].w, c_o, p["o"].bias,
                               weight_fp4_only=weight_fp4_only, host=host, layout=layout)

    if cfg.is_moe:
        out["router"] = p["router"]  # stays bf16 (qMixtralLayer.py:385)
        experts = []
        for e, ep in enumerate(p["experts"]):
            c_in = calib[f"expert{e}_{MLP_IN}"]
            c_dn = calib[f"expert{e}_{DOWN_IN}"]
            rp = _down_row_perm(c_dn, cfg.intermediate_size)
            experts.append({
                "site_in": make_site(c_in, hid),
                "site_down": QuantSite(*c_dn.splits(cfg.intermediate_size)),
                "w1": quantize_linear(ep["w1"].w, c_in, ep["w1"].bias,
                                      weight_fp4_only=weight_fp4_only,
                                      row_perm=rp, host=host, layout=layout),
                "w3": quantize_linear(ep["w3"].w, c_in, ep["w3"].bias,
                                      weight_fp4_only=weight_fp4_only,
                                      row_perm=rp, host=host, layout=layout),
                "w2": quantize_linear(ep["w2"].w, c_dn, ep["w2"].bias,
                                      weight_fp4_only=weight_fp4_only, host=host, layout=layout),
            })
        out["experts"] = experts
    else:
        c_mlp = calib[MLP_IN]
        c_dn = calib[DOWN_IN]
        out["mlp_site"] = make_site(c_mlp, hid)
        out["down_site"] = QuantSite(*c_dn.splits(cfg.intermediate_size))
        rp = _down_row_perm(c_dn, cfg.intermediate_size)
        out["gate"] = quantize_linear(p["gate"].w, c_mlp, p["gate"].bias,
                                      weight_fp4_only=weight_fp4_only,
                                      row_perm=rp, host=host, layout=layout)
        out["up"] = quantize_linear(p["up"].w, c_mlp, p["up"].bias,
                                    weight_fp4_only=weight_fp4_only,
                                    row_perm=rp, host=host, layout=layout)
        out["down"] = quantize_linear(p["down"].w, c_dn, p["down"].bias,
                                      weight_fp4_only=weight_fp4_only, host=host, layout=layout)
    return out


def stack_layer_projections(params: Dict[str, Any],
                            memo: Optional[dict] = None) -> Dict[str, Any]:
    """Serving-engine init transform: per layer, replace the q/k/v (and
    gate/up) ScaledW8 QuantLinears with ONE row-stacked ScaledW8Stack so
    the decode step runs each quantize site's consumers as a single
    multi-output Pallas call (kernels/mixed_matmul.mixed_matmul_w8_stack)
    and prefill runs one wide dot — the launch amortization the
    reference's beta-chained GEMM sequence provides (mgemm/src/gemm.cu:
    26-78), with identical values.

    The per-weight entries are REMOVED (not duplicated): the stack is the
    engine's only copy, so HBM holds one image of each weight.  Aliased
    layer dicts (share_layers benches, truncated-stack drafts) map to one
    shared stacked dict via ``memo``; pass one memo across target and
    draft params so shared layers stay shared.  Layers whose projections
    are not all ScaledW8 (split-plane layout, hetero budgets, dense) pass
    through untouched.  MoE expert w1/w3 stacking is handled by the EP
    engine separately.
    """
    from ..mx.mxtensor import MixedTensor, stack_split_plane
    from ..mx.scaledw8 import ScaledW8, stack_scaled_w8
    if memo is None:
        memo = {}

    def builder_for(p, names, site_key):
        # the site must be a segmented QuantSite: the hetero budgets-as-
        # data path (models/hetero.py FakeQuantSite) also carries ScaledW8
        # weights but quantizes through a different, per-channel interface
        if not isinstance(p.get(site_key), QuantSite):
            return None
        if not all(isinstance(p.get(n), QuantLinear) for n in names):
            return None
        ws = [p[n].w for n in names]
        if all(isinstance(w, ScaledW8) for w in ws):
            return stack_scaled_w8
        if all(isinstance(w, MixedTensor) and (w.fp4_packed or w.k4 == 0)
               for w in ws):
            return stack_split_plane
        return None

    def one(p):
        key = id(p)
        if key in memo:
            return memo[key]
        q = dict(p)
        mk = builder_for(p, ("q", "k", "v"), "attn_site")
        if mk is not None:
            q["qkv_stack"] = mk([p[n].w for n in ("q", "k", "v")],
                                [p[n].bias for n in ("q", "k", "v")])
            for n in ("q", "k", "v"):
                del q[n]
        mk = builder_for(p, ("gate", "up"), "mlp_site")
        if mk is not None:
            q["gateup_stack"] = mk([p[n].w for n in ("gate", "up")],
                                   [p[n].bias for n in ("gate", "up")])
            for n in ("gate", "up"):
                del q[n]
        experts = p.get("experts")
        if experts and all(
                builder_for(ep, ("w1", "w2", "w3"), "site_in")
                is stack_scaled_w8                     # grouped = W8-only
                for ep in experts) and len({
                    (ep["site_in"].splits, ep["site_down"].splits)
                    for ep in experts}) == 1:
            q["experts_grouped"] = _group_experts(experts)
            del q["experts"]
        memo[key] = q
        return q

    out = dict(params)
    out["layers"] = [one(p) for p in params["layers"]]
    return out


def _group_experts(experts: List[Dict[str, Any]]) -> Dict[str, Any]:
    """[per-expert quantized dicts] -> the grouped-GEMM serving form.

    Stacks every expert's w1|w3 (and w2) ScaledW8 codes into GroupedW8
    containers (mx/scaledw8.py) and the per-expert site routes into
    (E, K) arrays, so moe_block's grouped branch runs the whole expert
    loop as TWO block-diagonal Pallas calls
    (kernels/mixed_matmul.mixed_matmul_w8_grouped)."""
    import jax.numpy as jnp

    from ..mx.scaledw8 import group_scaled_w8

    def stackw(name):
        ws = [ep[name].w for ep in experts]
        base = jax.tree.map(lambda *xs: jnp.stack(xs), *ws)
        return base

    def stackb(name):
        bs = [ep[name].bias for ep in experts]
        if all(b is None for b in bs):
            return None
        assert all(b is not None for b in bs)
        return jnp.stack(bs)

    sites = [ep["site_in"] for ep in experts]
    benes = (jnp.stack([s.benes for s in sites])
             if all(s.benes is not None for s in sites) else None)
    perm = (jnp.stack([s.perm for s in sites])
            if all(s.perm is not None for s in sites) else None)
    return {
        "w13": group_scaled_w8([stackw("w1"), stackw("w3")],
                               [stackb("w1"), stackb("w3")]),
        "w2": group_scaled_w8([stackw("w2")], [stackb("w2")]),
        "benes": benes,
        "perm": perm,
        "site_in": QuantSite(*sites[0].splits),
        "site_down": QuantSite(*experts[0]["site_down"].splits),
    }


def quantize_model(params: Dict[str, Any], cfg: ModelConfig,
                   calibs: List[LayerCalib], *,
                   weight_fp4_only: bool = True,
                   host: bool = False,
                   layout: str = "auto") -> Dict[str, Any]:
    """Dense model pytree -> quantized pytree (embed / norms / head stay bf16,
    as in the reference which only swaps nn.Linear inside decoder layers)."""
    assert len(calibs) == cfg.num_layers
    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [
            quantize_layer(p, cfg, c, weight_fp4_only=weight_fp4_only, host=host, layout=layout)
            for p, c in zip(params["layers"], calibs)
        ],
    }


_WEIGHT_ONLY_BUDGETS = {"mxfp4": lambda k: (k, 0, 0),
                        "mxfp6": lambda k: (0, k, 0),
                        "mxfp8": lambda k: (0, 0, k)}


def quantize_model_weight_only(params: Dict[str, Any], cfg: ModelConfig,
                               fmt: str = "mxfp8",
                               layout: str = "auto") -> Dict[str, Any]:
    """Weight-only MX quantization (BASELINE.md config 1).

    Every decoder-layer linear becomes a WeightOnlyLinear holding the whole
    K axis in one MX format (symmetric — the weight keeps its own format,
    not the all-MXFP4 mode); activations stay bf16, no calibration, no
    channel reorder.  Router / embeddings / norms / head stay bf16.

    ``layout``: for fmt="mxfp4", "auto"/"scaledw8" store the weight as a
    canonical-order ScaledW8 (1 B/elem scaled codes, ~6-op kernel decode —
    the same trick that fixed the mixed decode GEMM, docs/perf_notes.md);
    "splitplane" keeps the packed MixedTensor (0.5 B/elem, capacity-first).
    Identical numerics: both decode to the exact same bf16 weight image.
    """
    from .common import WeightOnlyLinear

    budget = _WEIGHT_ONLY_BUDGETS[fmt]
    use_w8 = fmt == "mxfp4" and layout in ("auto", "scaledw8")

    def conv(lin):
        n, k = lin.w.shape
        wq = quantize_mixed(lin.w.astype(jnp.float32), *budget(k),
                            weight_fp4_only=False, pack_fp4=(fmt == "mxfp4"))
        if use_w8:
            from ..mx.mxtensor import dequantize_mixed
            from ..mx.scaledw8 import ScaledW8, encode_scaled_values
            vals = dequantize_mixed(wq, dtype=jnp.float32)  # canonical order
            codes, base = encode_scaled_values(vals, check=True)
            wq = ScaledW8(codes=codes, base=base, k4=k, k6=0, k8=0)
        return WeightOnlyLinear(
            w=wq,
            bias=None if lin.bias is None else lin.bias.astype(jnp.bfloat16))

    def layer(p):
        out = {"ln1": p["ln1"], "ln2": p["ln2"]}
        for name in ("q", "k", "v", "o"):
            out[name] = conv(p[name])
        if cfg.is_moe:
            out["router"] = p["router"]
            out["experts"] = [
                {n: conv(ep[n]) for n in ("w1", "w3", "w2")}
                for ep in p["experts"]
            ]
        else:
            for name in ("gate", "up", "down"):
                out[name] = conv(p[name])
        return out

    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [layer(p) for p in params["layers"]],
    }


def quantize_model_int8_turbo(params: Dict[str, Any],
                              cfg: ModelConfig) -> Dict[str, Any]:
    """TURBO EXTENSION: every decoder linear -> W8A8 int8 (s8 MXU path).

    Out-of-spec vs MicroMix (models/common.Int8TurboLinear docstring); no
    calibration needed — weights are symmetric per-output-channel, the
    activation scale is dynamic per row.  Apply calib/smooth.smooth_params
    first for SmoothQuant-style W8A8 accuracy.
    """
    from .common import Int8TurboLinear

    def conv(lin):
        w = np.asarray(lin.w, np.float32)
        s = np.maximum(np.abs(w).max(axis=1), 1e-12) / 127.0
        q = np.clip(np.round(w / s[:, None]), -127, 127).astype(np.int8)
        return Int8TurboLinear(
            w=jnp.asarray(q), w_scale=jnp.asarray(s, jnp.float32),
            bias=None if lin.bias is None else lin.bias.astype(jnp.bfloat16))

    def layer(p):
        out = {"ln1": p["ln1"], "ln2": p["ln2"]}
        for name in ("q", "k", "v", "o"):
            out[name] = conv(p[name])
        if cfg.is_moe:
            out["router"] = p["router"]
            out["experts"] = [
                {n: conv(ep[n]) for n in ("w1", "w3", "w2")}
                for ep in p["experts"]
            ]
        else:
            for name in ("gate", "up", "down"):
                out[name] = conv(p[name])
        return out

    return {
        "embed": params["embed"],
        "final_ln": params["final_ln"],
        "lm_head": params["lm_head"],
        "layers": [layer(p) for p in params["layers"]],
    }


def default_calibration(cfg: ModelConfig, p6: int = 0, p8: int = 0,
                        seed: Optional[int] = None) -> List[LayerCalib]:
    """Identity (or seeded-random) calibration for tests and weight-only
    modes; real calibration lives in calib/."""
    hid = cfg.hidden_size
    inter = cfg.intermediate_size
    odim = cfg.num_heads * cfg.head_dim
    rng = np.random.default_rng(seed) if seed is not None else None

    def mk(k):
        idx = (rng.permutation(k).astype(np.int32) if rng is not None
               else np.arange(k, dtype=np.int32))
        return SiteCalibration(idx, p6, p8)

    out = []
    for _ in range(cfg.num_layers):
        c: LayerCalib = {ATTN_IN: mk(hid), O_IN: mk(odim)}
        if cfg.is_moe:
            for e in range(cfg.num_experts):
                c[f"expert{e}_{MLP_IN}"] = mk(hid)
                c[f"expert{e}_{DOWN_IN}"] = mk(inter)
        else:
            c[MLP_IN] = mk(hid)
            c[DOWN_IN] = mk(inter)
        out.append(c)
    return out


# ---------------------------------------------------------------------------
# Random dense init (tests / benchmarks)
# ---------------------------------------------------------------------------


def random_dense_params(cfg: ModelConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    odim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim

    def lin(n, k, bias=False, scale=None):
        s = scale if scale is not None else 1.0 / np.sqrt(k)
        w = jnp.asarray(rng.normal(0, s, (n, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 0.01, (n,)), jnp.bfloat16) if bias else None
        return DenseLinear(w=w, bias=b)

    def layer():
        p = {
            "ln1": jnp.ones((hid,), jnp.bfloat16),
            "ln2": jnp.ones((hid,), jnp.bfloat16),
            "q": lin(odim, hid, cfg.qkv_bias),
            "k": lin(kvdim, hid, cfg.qkv_bias),
            "v": lin(kvdim, hid, cfg.qkv_bias),
            "o": lin(hid, odim),
        }
        if cfg.is_moe:
            p["router"] = lin(cfg.num_experts, hid)
            p["experts"] = [
                {"w1": lin(inter, hid), "w3": lin(inter, hid),
                 "w2": lin(hid, inter)}
                for _ in range(cfg.num_experts)
            ]
        else:
            p["gate"] = lin(inter, hid)
            p["up"] = lin(inter, hid)
            p["down"] = lin(hid, inter)
        return p

    embed = jnp.asarray(rng.normal(0, 0.02, (cfg.vocab_size, hid)),
                        jnp.bfloat16)
    return {
        "embed": embed,
        "final_ln": jnp.ones((hid,), jnp.bfloat16),
        "lm_head": embed if cfg.tie_embeddings else jnp.asarray(
            rng.normal(0, 0.02, (cfg.vocab_size, hid)), jnp.bfloat16),
        "layers": [layer() for _ in range(cfg.num_layers)],
    }
