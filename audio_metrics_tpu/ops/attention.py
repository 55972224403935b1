"""Fused Swin attention-half Pallas kernel for the HTSAT encoder.

The HTSAT forward is HBM-bandwidth-bound and XLA's lowering of its windowed
attention is the dominant traffic: the (B*nW, heads, n, n) score tensor and
the qkv activations round-trip HBM several times (f32 matmul outputs,
separate bias adds, an unfused softmax chain — measured ~3.6 GB per stage-0
block at B=64 against a 67 MB block activation).

This kernel runs the ENTIRE attention half of a Swin block — LayerNorm,
shifted-window roll, window partition, per-head qkv projections, scores,
bias+mask, softmax, context, output projection and the residual add — in one
pallas_call.  HBM sees the block input once in and the residual output once
out (plus the small weights); scores/probs/q/k/v only ever exist in VMEM.

Head extraction never slices the lane dimension (Mosaic relayouts there are
expensive and minor-dim reshape splits are unsupported): the qkv weights are
pre-split per head into (heads, C, d) operands, so each head's q/k/v come
from thin MXU matmuls, and the per-head output projections accumulate into
an f32 (rows, C) buffer — no lane-dim concatenation either.

Algebraic folds done at call time (free, outside the kernel):
  - the 1/sqrt(d) score scale is folded into wq/bq;
  - the key bias drops out entirely (a per-row constant under softmax);
  - the value bias times wproj folds into the projection bias
    (softmax rows sum to 1).

Used by models/htsat.py on the TPU backend; the XLA einsum path remains the
fallback (CPU, or AM_TPU_NO_PALLAS=1).  Replaces the torch WindowAttention
behaviour of the reference's laion_clap HTSAT tower (SURVEY.md component 14;
reference embedders/clap.py:17).
"""

from __future__ import annotations

import contextlib
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "swin_attention_block_pallas",
    "swin_attention_block_pallas_v2",
    "swin_attention_block_pallas_v3",
]


def _x32_scope():
    """Kernel literals must stay 32-bit under the package's global x64."""
    if hasattr(jax, "enable_x64"):  # jax >= 0.9
        return jax.enable_x64(False)
    try:
        return jax.experimental.disable_x64()
    except AttributeError:
        return contextlib.nullcontext()


def _dot_precision(*operands):
    """Explicit precision for in-kernel dots: DEFAULT when every operand is
    bf16, else ambient.  Ambient ``jax_default_matmul_precision="highest"``
    (the nightly's setting for its f32 parity oracles, tests/conftest.py)
    otherwise reaches the kernel's dots and requests an fp32-contraction
    ``tpu.matmul`` on bf16 operands, which Mosaic rejects with a bare
    "Bad lhs type" — and bf16 operands carry no extra bits for HIGHEST to
    preserve anyway.  f32 dots keep the ambient setting (pinning them to
    DEFAULT would silently degrade the f32 parity path to bf16 passes)."""
    if all(o.dtype == jnp.bfloat16 for o in operands):
        return jax.lax.Precision.DEFAULT
    return None


_TARGET_BLOCK_BYTES = 2 * 1024 * 1024

# COST-PROBE switch: replaces the v3/v4 window partition/reverse transposes
# with pure reshapes.  WRONG MATH — never enable outside A/B cost probes;
# it exists to bound the relayout cost in the full forward (the truncated-
# kernel probe methodology is too noisy for this, see BASELINE.md).
_PROBE_NOPART = os.environ.get("AM_TPU_PROBE_NOPART", "") == "1"

# COST-PROBE switch: treats each 128-lane head group as ONE head — no
# block-diagonal kw/vw build, scores/exp/context contract over n instead of
# gh*n.  WRONG MATH — bounds the total per-head-structure cost (build
# traffic + the gh-times-wider score/softmax/context) in the full forward;
# anything a head-packing trick could ever save is <= this delta.
_PROBE_FLATHEAD = os.environ.get("AM_TPU_PROBE_FLATHEAD", "") == "1"

# Post-scale softmax in the v3/v4 kernels: contract the UNNORMALIZED exp
# with the block-diagonal V and apply the per-(row, head) reciprocal to the
# narrow (n, gw) context instead of the wide (n, heads*n) probabilities.
# Exact up to reassociation (the reciprocal is constant over each head's
# contribution lanes because vw is block-diagonal); saves the gh->gn spread
# matmul and turns the wide e*rw multiply into a gw-wide one.  Opt-out.
_ATTN_POSTSCALE = os.environ.get("AM_TPU_ATTN_NOPOSTSCALE", "") != "1"


def _kb_for(batch: int, per_image_bytes: int) -> int:
    kb = 1
    while (
        kb * 2 <= batch
        and batch % (kb * 2) == 0
        and (kb * 2) * per_image_bytes <= _TARGET_BLOCK_BYTES
    ):
        kb *= 2
    return kb


def _attn_block_kernel(
    heads: int,
    window: int,
    shift: int,
    eps: float,
    x_ref,
    ln_w_ref,
    ln_b_ref,
    wq_ref,
    bq_ref,
    wk_ref,
    wv_ref,
    wp_ref,
    bp_ref,
    bm_ref,
    out_ref,
):
    kb, height, width, c = x_ref.shape
    n = window * window
    hb, wb = height // window, width // window
    g = kb * hb * wb  # windows in this block
    rows = kb * height * width
    dt = x_ref.dtype

    xin = x_ref[:].reshape(rows, c)

    # LayerNorm (f32 statistics)
    xf = xin.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    xn_f32 = (
        (xf - mu)
        * jax.lax.rsqrt(var + jnp.float32(eps))
        * ln_w_ref[:].astype(jnp.float32)
        + ln_b_ref[:].astype(jnp.float32)
    )

    x4 = xn_f32.reshape(kb, height, width, c)
    if shift:
        # pltpu.roll wants non-negative shifts (roll(-s) == roll(size - s))
        # and 32-bit data, so roll before the bf16 cast
        x4 = pltpu.roll(x4, height - shift, 1)
        x4 = pltpu.roll(x4, width - shift, 2)
    x4 = x4.astype(dt)

    # window partition: sublane-aligned reshape/transpose only
    xw = (
        x4.reshape(kb, hb, window, wb, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(g * n, c)
    )

    acc = jnp.zeros((rows, c), jnp.float32)
    for h in range(heads):
        prec = _dot_precision(xw, wq_ref[h])
        q = (
            jnp.dot(
                xw, wq_ref[h],
                preferred_element_type=jnp.float32, precision=prec,
            )
            + bq_ref[h].astype(jnp.float32)
        ).astype(dt)
        k = jnp.dot(
            xw, wk_ref[h], preferred_element_type=jnp.float32, precision=prec
        ).astype(dt)
        v = jnp.dot(
            xw, wv_ref[h], preferred_element_type=jnp.float32, precision=prec
        ).astype(dt)
        d = q.shape[-1]
        s = jax.lax.dot_general(
            q.reshape(g, n, d),
            k.reshape(g, n, d),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q, k),
        )
        bm = bm_ref[:, h]  # (nW, n, n) f32
        if bm_ref.shape[0] == 1:
            s = s + bm[0][None]
        else:
            s = s + jnp.broadcast_to(
                bm[None], (kb, bm_ref.shape[0], n, n)
            ).reshape(g, n, n)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ctx = jax.lax.dot_general(
            p,
            v.reshape(g, n, d),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(p, v),
        ).astype(dt)
        acc = acc + jnp.dot(
            ctx.reshape(g * n, d),
            wp_ref[h],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(ctx, wp_ref[h]),
        )

    ow = acc + bp_ref[:].astype(jnp.float32)
    o4 = (
        ow.reshape(kb, hb, wb, window, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(kb, height, width, c)
    )
    if shift:
        o4 = pltpu.roll(o4, shift, 1)
        o4 = pltpu.roll(o4, shift, 2)
    # (o4 rolls are already non-negative)
    out_ref[:] = (
        o4.reshape(rows, c) + xin.astype(jnp.float32)
    ).astype(dt).reshape(kb, height, width, c)


def _attn_block_kernel_v2(
    heads: int,
    window: int,
    shift: int,
    eps: float,
    x_ref,
    ln_w_ref,
    ln_b_ref,
    wqkv_ref,
    bq_ref,
    wp_ref,
    bp_ref,
    bm_ref,
    out_ref,
):
    """Lane-masked variant (measured ALTERNATIVE, not wired in): the v1
    kernel spends most of its time outside the score/context math (isolated
    on v5e: dropping scores+softmax+context entirely only removes ~30%), so
    this variant replaces the per-head thin qkv/proj matmuls (N = d = 32, a
    quarter-lane MXU output) with ONE full-width (C, 3C) qkv matmul and ONE
    (C, C) projection.  Per-head score/context contractions then run over
    ALL C lanes with the k/v operand lane-masked to the head's d-lane range
    (zeros contribute nothing), and each head's context lands in its own
    lane range so heads accumulate directly — no lane slicing anywhere.

    Measured v5e B=64: v2 ~= v1 within +-15% (wins slightly at stage-0
    unshifted, loses at stage 1) — the 4-8x wider score/context
    contractions cost what the wide qkv/proj saves.  Kept as a tested
    parity-exact alternative and a record of the negative result."""
    kb, height, width, c = x_ref.shape
    n = window * window
    hb, wb = height // window, width // window
    g = kb * hb * wb
    rows = kb * height * width
    d = c // heads
    dt = x_ref.dtype

    xin = x_ref[:].reshape(rows, c)
    xf = xin.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    xn_f32 = (
        (xf - mu)
        * jax.lax.rsqrt(var + jnp.float32(eps))
        * ln_w_ref[:].astype(jnp.float32)
        + ln_b_ref[:].astype(jnp.float32)
    )

    x4 = xn_f32.reshape(kb, height, width, c)
    if shift:
        x4 = pltpu.roll(x4, height - shift, 1)
        x4 = pltpu.roll(x4, width - shift, 2)
    x4 = x4.astype(dt)
    xw = (
        x4.reshape(kb, hb, window, wb, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(g * n, c)
    )

    y = (
        jnp.dot(
            xw,
            wqkv_ref[:],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(xw, wqkv_ref[:]),
        )
        + bq_ref[:].astype(jnp.float32)
    ).astype(dt)
    q = y[:, :c].reshape(g, n, c)
    k = y[:, c : 2 * c].reshape(g, n, c)
    v = y[:, 2 * c :].reshape(g, n, c)

    head_id = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c), 2) // d
    ctx = None
    for h in range(heads):
        mask = (head_id == h).astype(dt)
        s = jax.lax.dot_general(
            q,
            k * mask,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q, k),
        )
        bm = bm_ref[:, h]
        if bm_ref.shape[0] == 1:
            s = s + bm[0][None]
        else:
            s = s + jnp.broadcast_to(
                bm[None], (kb, bm_ref.shape[0], n, n)
            ).reshape(g, n, n)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        part = jax.lax.dot_general(
            p,
            v * mask,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(p, v),
        )
        ctx = part if ctx is None else ctx + part

    ctx_dt = ctx.reshape(g * n, c).astype(dt)
    ow = (
        jnp.dot(
            ctx_dt,
            wp_ref[:],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(ctx_dt, wp_ref[:]),
        )
        + bp_ref[:].astype(jnp.float32)
    )
    o4 = (
        ow.reshape(kb, hb, wb, window, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(kb, height, width, c)
    )
    if shift:
        o4 = pltpu.roll(o4, shift, 1)
        o4 = pltpu.roll(o4, shift, 2)
    out_ref[:] = (
        o4.reshape(rows, c) + xin.astype(jnp.float32)
    ).astype(dt).reshape(kb, height, width, c)


@partial(
    jax.jit, static_argnames=("heads", "window", "shift", "eps", "interpret")
)
def _attn_block_call_v2(
    x, ln_w, ln_b, wqkv, bq, wp, bp, bm, heads, window, shift, eps, interpret
):
    b, height, width, c = x.shape
    kb = _kb_for(b, height * width * c * x.dtype.itemsize)
    n = window * window
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_attn_block_kernel_v2, heads, window, shift, eps),
        grid=(b // kb,),
        in_specs=[
            pl.BlockSpec(
                (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            wspec(ln_w.shape),
            wspec(ln_b.shape),
            wspec(wqkv.shape),
            wspec(bq.shape),
            wspec(wp.shape),
            wspec(bp.shape),
            wspec((bm.shape[0], heads, n, n)),
        ],
        out_specs=pl.BlockSpec(
            (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w, ln_b, wqkv, bq, wp, bp, bm)


@partial(
    jax.jit, static_argnames=("heads", "window", "shift", "eps", "interpret")
)
def _attn_block_call(
    x, ln_w, ln_b, wq, bq, wk, wv, wp, bp, bm, heads, window, shift, eps, interpret
):
    b, height, width, c = x.shape
    kb = _kb_for(b, height * width * c * x.dtype.itemsize)
    nw = (height // window) * (width // window)
    n = window * window
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_attn_block_kernel, heads, window, shift, eps),
        grid=(b // kb,),
        in_specs=[
            pl.BlockSpec(
                (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            wspec(ln_w.shape),
            wspec(ln_b.shape),
            wspec(wq.shape),
            wspec(bq.shape),
            wspec(wk.shape),
            wspec(wv.shape),
            wspec(wp.shape),
            wspec(bp.shape),
            wspec((bm.shape[0], heads, n, n)),
        ],
        out_specs=pl.BlockSpec(
            (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w, ln_b, wq, bq, wk, wv, wp, bp, bm)


def swin_attention_block_pallas(
    x,
    ln_w,
    ln_b,
    wq,
    bq,
    wk,
    wv,
    wp,
    bp,
    bias_mask,
    heads: int,
    window: int,
    shift: int,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Fused attention half of a Swin block (pre-LN convention).

    x: (B, H, W, C); returns x + WindowAttention(LN(x)) with the same shape.
    wq/wk/wv: (heads, C, d) per-head projections — wq/bq pre-scaled by
    1/sqrt(d).  wp: (heads, d, C) per-head output projection; bp must
    already absorb the value bias (bp + sum_h bv_h @ wp_h).  bias_mask:
    (nW or 1, heads, n, n) f32 relative-position bias (+ shift mask),
    already in window order.  shift: static shifted-window offset (the
    roll happens inside the kernel).
    """
    with _x32_scope():
        return _attn_block_call(
            x,
            ln_w,
            ln_b,
            wq,
            bq,
            wk,
            wv,
            wp,
            bp,
            jnp.asarray(bias_mask, jnp.float32),
            heads,
            window,
            int(shift),
            float(eps),
            interpret,
        )


def swin_attention_block_pallas_v2(
    x,
    ln_w,
    ln_b,
    wqkv,
    bq3,
    wp,
    bp,
    bias_mask,
    heads: int,
    window: int,
    shift: int,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Lane-masked fused attention half (see _attn_block_kernel_v2).

    wqkv: (C, 3C) fused [wq*scale | wk | wv] columns; bq3: (3C,) with the
    scaled q bias in the first C entries and zeros elsewhere (the key bias
    is a per-score-row constant and drops out of softmax; the value bias
    must already be folded into bp: bp + bv @ wp).  wp: (C, C).  bias_mask
    as in swin_attention_block_pallas.
    """
    with _x32_scope():
        return _attn_block_call_v2(
            x,
            ln_w,
            ln_b,
            wqkv,
            jnp.asarray(bq3, jnp.float32),
            wp,
            bp,
            jnp.asarray(bias_mask, jnp.float32),
            heads,
            window,
            int(shift),
            float(eps),
            interpret,
        )


def _lane_groups_for(heads: int, d: int, grouped: bool) -> int:
    """Number of 128-lane head groups for the grouped score/context path.

    The v3 block-diagonal wide K/V spans ALL heads' lanes: (heads*n, C) with
    only d/C nonzero density — at HTSAT-base stage 2 (heads=16, d=32, C=512)
    that is 1/16 density, i.e. 16x wasted MXU MACs on the score and context
    contractions and a C/128-times-larger VMEM build for kw/vw.  Packing
    heads into groups of gh = 128/d (the MXU lane width) keeps every slice
    128-lane-aligned while cutting both costs by C/128 (4x at stage 2, 2x at
    stage 1, 8x at stage 3; stage 0 has C=128 so grouping is the v3 layout
    already).  Softmax stays segment-exact per group (the per-group row max
    is still a constant within each head's segment)."""
    if not grouped or d > 128 or 128 % d:
        return 1
    gh = 128 // d
    if heads % gh:
        return 1
    return heads // gh


def _attn_windows_to_ctx(
    heads: int, n: int, grouped: bool, g: int, q, k, v, bmw_ref, kb: int
):
    """Scores + segmented softmax + context for all heads of all windows.

    q/k/v: (g, n, C) with heads laid out contiguously on the lane axis.
    Returns the per-window context (g, n, C) f32 with each head's output in
    its own lane range.  ``grouped`` selects the 128-lane head-group path
    (see _lane_groups_for); groups == 1 reproduces the v3 all-heads layout.
    """
    c = q.shape[-1]
    d = c // heads
    dt = q.dtype
    ngroups = _lane_groups_for(heads, d, grouped)
    gh = heads // ngroups  # heads per group
    gw = gh * d  # lanes per group (128 when grouped)
    gn = gh * n

    # per-head lane mask (gh, 1, gw): head i keeps its own lane range; the
    # broadcast-multiply + reshape builds the block-diagonal wide K/V in ONE
    # fused pass (no concat-then-mask double materialization)
    hm = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gw), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gw), 2) // d
    ).astype(dt)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (gn, gh), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (gn, gh), 1)
    ).astype(jnp.float32)
    if _ATTN_POSTSCALE:
        # segment -> lane spread (gh, gw): lane c belongs to head c // d
        sel_lane = (
            jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) // d
        ).astype(jnp.float32)

    if _PROBE_FLATHEAD and _ATTN_POSTSCALE:
        # COST PROBE ONLY (wrong math; see _PROBE_FLATHEAD above): same
        # qkv/proj and per-group slicing, but one 128-lane "head" per group
        parts = []
        for j in range(ngroups):
            qg = q[:, :, j * gw : (j + 1) * gw]
            kg = k[:, :, j * gw : (j + 1) * gw]
            vg = v[:, :, j * gw : (j + 1) * gw]
            s = jax.lax.dot_general(
                qg, kg,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(qg, kg),
            )  # (g, n, n)
            bg = bmw_ref[:, :, j * gn : j * gn + n]
            if bmw_ref.shape[0] == 1:
                s = s + bg[0][None]
            else:
                s = (s.reshape(kb, bmw_ref.shape[0], n, n) + bg[None]).reshape(
                    g, n, n
                )
            e = jnp.exp(jnp.clip(s, -80.0, 80.0))
            den = jax.lax.dot_general(
                e, sel[:n], dimension_numbers=(((2,), (0,)), ((), ()))
            )  # (g, n, gh)
            ew = e.astype(dt)
            raw = jax.lax.dot_general(
                ew, vg,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(ew, vg),
            )  # (g, n, gw)
            rwl = jax.lax.dot_general(
                1.0 / den, sel_lane, dimension_numbers=(((2,), (0,)), ((), ()))
            )
            parts.append(raw * rwl)
        return parts[0] if ngroups == 1 else jnp.concatenate(parts, axis=-1)

    parts = []
    for j in range(ngroups):
        qg = q[:, :, j * gw : (j + 1) * gw]
        kg = k[:, :, j * gw : (j + 1) * gw]
        vg = v[:, :, j * gw : (j + 1) * gw]
        kw = (kg[:, None] * hm[None]).reshape(g, gn, gw)
        vw = (vg[:, None] * hm[None]).reshape(g, gn, gw)

        s = jax.lax.dot_general(
            qg,
            kw,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(qg, kw),
        )  # (g, n, gn)
        bg = bmw_ref[:, :, j * gn : (j + 1) * gn]
        if bmw_ref.shape[0] == 1:
            s = s + bg[0][None]
        else:
            # broadcast-add over the image axis without materializing the
            # (kb, nW, n, gn) table (the explicit broadcast_to+reshape showed
            # up as part of the shifted-block penalty at stages 0/2)
            s = (
                s.reshape(kb, bmw_ref.shape[0], n, gn) + bg[None]
            ).reshape(g, n, gn)

        # Reduce-free softmax: the row-max shift cancels in the softmax
        # ratio, so skipping it is exact as long as f32 exp stays finite —
        # clamping s to [-80, 80] guarantees that (e^80 * n < f32 max,
        # 64*e^-80 > 0 so the segment sums never hit 0/inf) and only
        # engages on pathological inputs (LN'd activations give |s| <~ 30).
        # The wide divide becomes a reciprocal on the NARROW (g, n, gh)
        # segment sums — by default applied POST-contraction to the (n, gw)
        # context (see _ATTN_POSTSCALE above; 33.44 -> 32.69 ms/128), else
        # spread over gn by the selector matmul.  The cross-lane max reduce
        # + wide divide were measured as THE stage-0 cost
        # (scripts/probe_stage0.py: softmax +1.11 ms of the 2.2 ms block).
        e = jnp.exp(jnp.clip(s, -80.0, 80.0))
        den = jax.lax.dot_general(
            e, sel, dimension_numbers=(((2,), (0,)), ((), ()))
        )  # (g, n, gh)
        if _ATTN_POSTSCALE:
            # contract the unnormalized exp with the block-diagonal V, then
            # scale the NARROW (n, gw) context by the per-(row, head)
            # reciprocal spread to that head's d lanes.  Exact modulo
            # reassociation: within head h's output lanes only segment-h
            # rows of vw are nonzero, so 1/den[:, h] is a constant factor
            # of every contributing term.  Overflow-safe: e <= exp(80) and
            # n <= 64, so the f32 partial sums stay < 2^127.
            ew = e.astype(dt)
            raw = jax.lax.dot_general(
                ew,
                vw,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(ew, vw),
            )  # (g, n, gw), unnormalized
            rwl = jax.lax.dot_general(
                1.0 / den, sel_lane, dimension_numbers=(((2,), (0,)), ((), ()))
            )  # (g, n, gw)
            parts.append(raw * rwl)
        else:
            rw = jax.lax.dot_general(
                1.0 / den, sel, dimension_numbers=(((2,), (1,)), ((), ()))
            )  # (g, n, gn)
            p = (e * rw).astype(dt)

            parts.append(
                jax.lax.dot_general(
                    p,
                    vw,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(p, vw),
                )  # (g, n, gw): head h's context in its own lane range
            )
    return parts[0] if ngroups == 1 else jnp.concatenate(parts, axis=-1)


def _attn_residual_rows(
    heads: int,
    window: int,
    shift: int,
    eps: float,
    grouped: bool,
    x_ref,
    wqkv_ref,
    bq_ref,
    wp_ref,
    bp_ref,
    bmw_ref,
):
    """The attention half shared by the v3 and v4 kernels: LayerNorm
    (affine pre-folded into wqkv/bq by the caller; the mean/var normalize
    itself is folded through the qkv matmul as a per-row scale plus rank-1
    correction), shifted-window roll (on raw 16-bit data), window
    partition, fused qkv, all-heads scores/softmax/context (optionally
    128-lane head-grouped), output projection, window reverse, and the
    residual add.

    Returns (xin_rows, res_rows_f32): the flattened input and the f32
    residual-summed attention output, both (rows, C)."""
    kb, height, width, c = x_ref.shape
    n = window * window
    hb, wb = height // window, width // window
    g = kb * hb * wb
    rows = kb * height * width
    dt = x_ref.dtype

    xin = x_ref[:].reshape(rows, c)

    # LN folded THROUGH the qkv matmul: LN(x)@W == rs*(x@W) - (rs*mu)*(1@W)
    # (per-row scalars commute with the contraction; same identity as the
    # patch-merge conv fold).  The normalized activation tensor is never
    # materialized, and the shifted-window rolls run on the raw 16-bit data
    # via a paired-lane int32 bitcast (pltpu.roll wants 32-bit data; packing
    # halves the w axis, so the w roll moves (width-shift)/2 pairs — shifts
    # here are even).  mu/rs are computed from the window-transposed rows,
    # which is the same per-row reduction after a row permutation.
    x4 = xin.reshape(kb, height, width, c)
    if shift:
        if dt == jnp.bfloat16 and width % 2 == 0 and shift % 2 == 0:
            xi = pltpu.bitcast(x4, jnp.int32)
            xi = pltpu.roll(xi, height - shift, 1)
            xi = pltpu.roll(xi, (width - shift) // 2, 2)
            x4 = pltpu.bitcast(xi, dt)
        else:
            x4 = pltpu.roll(x4.astype(jnp.float32), height - shift, 1)
            x4 = pltpu.roll(x4, width - shift, 2).astype(dt)
    if _PROBE_NOPART:
        # COST PROBE ONLY (wrong math, identical shapes/op mix minus the
        # transposes): bounds what the window-partition relayouts cost.
        xw = x4.reshape(g * n, c)
    else:
        xw = (
            x4.reshape(kb, hb, window, wb, window, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(g * n, c)
        )
    xwf = xw.astype(jnp.float32)
    mu = jnp.mean(xwf, axis=-1, keepdims=True)
    var = jnp.mean((xwf - mu) * (xwf - mu), axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + jnp.float32(eps))
    csum = jnp.sum(wqkv_ref[:].astype(jnp.float32), axis=0)  # (3c,) == 1@W

    y = (
        jnp.dot(
            xw,
            wqkv_ref[:],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(xw, wqkv_ref[:]),
        )
        * rs
        - (rs * mu) * csum[None, :]
        + bq_ref[:].astype(jnp.float32)
    ).astype(dt)
    q = y[:, :c].reshape(g, n, c)
    k = y[:, c : 2 * c].reshape(g, n, c)
    v = y[:, 2 * c :].reshape(g, n, c)

    ctx = _attn_windows_to_ctx(heads, n, grouped, g, q, k, v, bmw_ref, kb)
    ctx_dt = ctx.reshape(g * n, c).astype(dt)
    ow = (
        jnp.dot(
            ctx_dt,
            wp_ref[:],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(ctx_dt, wp_ref[:]),
        )
        + bp_ref[:].astype(jnp.float32)
    )
    if _PROBE_NOPART:
        o4 = ow.reshape(kb, height, width, c)  # cost probe: see xw above
    else:
        o4 = (
            ow.reshape(kb, hb, wb, window, window, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(kb, height, width, c)
        )
    if shift:
        o4 = pltpu.roll(o4, shift, 1)
        o4 = pltpu.roll(o4, shift, 2)
    return xin, o4.reshape(rows, c) + xin.astype(jnp.float32)


def _attn_block_kernel_v3(
    heads: int,
    window: int,
    shift: int,
    eps: float,
    grouped: bool,
    x_ref,
    wqkv_ref,
    bq_ref,
    wp_ref,
    bp_ref,
    bmw_ref,
    out_ref,
):
    """All-heads-in-one-matmul variant for FEW-window stages.

    v1/v2 lose at the late stages because Mosaic executes their per-head
    contractions as unrolled thin matmuls (d = 32 of 128 MXU lanes).  v3
    eliminates the head loop entirely:

    - K and V are tiled along the sublane axis and masked to a
      block-diagonal layout (``kw[i, ch] != 0`` iff ``ch`` belongs to head
      ``i // n``), so ONE transpose-free NT contraction per window (or per
      128-lane head group, see _lane_groups_for) computes the heads' scores
      and one more computes their context, with each head landing in its own
      lane range (no sub-128 lane slicing anywhere).
    - Softmax is exact per head-segment: subtracting the whole-row max (a
      per-row CONSTANT) preserves each segment's softmax exactly, and the
      per-segment sums come from a 0/1 selector matmul, spread back by its
      transpose.

    bmw_ref is the (nW or 1, n, heads*n) "wide" additive bias+mask layout.
    The LN affine is pre-folded into wqkv/bq by the caller
    (models/htsat._v3_kernel_weights); the kernel only mean/var-normalizes.
    """
    kb, height, width, c = x_ref.shape
    dt = x_ref.dtype
    _, res = _attn_residual_rows(
        heads, window, shift, eps, grouped,
        x_ref, wqkv_ref, bq_ref, wp_ref, bp_ref, bmw_ref,
    )
    out_ref[:] = res.astype(dt).reshape(kb, height, width, c)


def _kb_for_v3(
    batch: int, height: int, width: int, c: int, heads: int, window: int,
    grouped: bool = False,
) -> int:
    """Largest power-of-2 image count whose v3 VMEM footprint stays ~<=48MB
    (kw/vw tiles dominate: 2 * heads*n * gw * 2B per window, where gw is the
    head-group lane width — C ungrouped, 128 grouped)."""
    n = window * window
    hn = heads * n
    d = c // heads
    gw = c // _lane_groups_for(heads, d, grouped)
    nw = (height // window) * (width // window)
    per_image = nw * (2 * hn * gw * 2 + n * hn * 10) + height * width * c * 4
    kb = 1
    while kb * 2 <= batch and batch % (kb * 2) == 0 and (kb * 2) * per_image <= 48 * 1024 * 1024:
        kb *= 2
    return kb


@partial(
    jax.jit,
    static_argnames=("heads", "window", "shift", "eps", "grouped", "interpret"),
)
def _attn_block_call_v3(
    x, wqkv, bq, wp, bp, bmw, heads, window, shift, eps, grouped, interpret
):
    b, height, width, c = x.shape
    kb = _kb_for_v3(b, height, width, c, heads, window, grouped)
    n = window * window
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_attn_block_kernel_v3, heads, window, shift, eps, grouped),
        grid=(b // kb,),
        in_specs=[
            pl.BlockSpec(
                (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            wspec(wqkv.shape),
            wspec(bq.shape),
            wspec(wp.shape),
            wspec(bp.shape),
            wspec((bmw.shape[0], n, heads * n)),
        ],
        out_specs=pl.BlockSpec(
            (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, bq, wp, bp, bmw)


def _fold_ln_affine(ln_w, ln_b, wqkv, bq3):
    """Fold a LayerNorm affine into the fused qkv projection:
    (xn*w + b) @ W == xn @ (w[:, None] * W) + b @ W (exact in exact
    arithmetic) — the kernel then only mean/var-normalizes, saving two
    vector passes over the full activation."""
    wf = jnp.asarray(wqkv, jnp.float32)
    folded_w = (jnp.asarray(ln_w, jnp.float32)[:, None] * wf).astype(wqkv.dtype)
    folded_b = jnp.asarray(bq3, jnp.float32) + jnp.asarray(ln_b, jnp.float32) @ wf
    return folded_w, folded_b


def swin_attention_block_pallas_v3(
    x,
    ln_w,
    ln_b,
    wqkv,
    bq3,
    wp,
    bp,
    bias_mask,
    heads: int,
    window: int,
    shift: int,
    eps: float = 1e-5,
    grouped: bool = False,
    interpret: bool = False,
):
    """All-heads-in-one-matmul fused attention half (_attn_block_kernel_v3).

    Same weight layout as v2 (wqkv (C, 3C) with scaled q, bq3 (3C,) with
    only the scaled q bias, wp (C, C), bp absorbing the value bias);
    bias_mask: (nW or 1, heads, n, n) — converted here to the kernel's wide
    (nW, n, heads*n) layout.  Pass ln_w=ln_b=None when the LN affine is
    already folded into wqkv/bq3 (models/htsat._v3_kernel_weights does
    this); otherwise it is folded here.  ``grouped`` enables the 128-lane
    head-group score/context path (see _lane_groups_for).
    """
    if ln_w is not None:
        wqkv, bq3 = _fold_ln_affine(ln_w, ln_b, wqkv, bq3)
    nw, h_, n, _ = bias_mask.shape
    bmw = jnp.asarray(bias_mask, jnp.float32).transpose(0, 2, 1, 3).reshape(
        nw, n, h_ * n
    )
    with _x32_scope():
        return _attn_block_call_v3(
            x,
            wqkv,
            jnp.asarray(bq3, jnp.float32),
            wp,
            bp,
            bmw,
            heads,
            window,
            int(shift),
            float(eps),
            bool(grouped),
            interpret,
        )


def _swin_block_kernel_v4(
    heads: int,
    window: int,
    shift: int,
    eps: float,
    grouped: bool,
    gelu_mode: str,
    x_ref,
    wqkv_ref,
    bq_ref,
    wp_ref,
    bp_ref,
    bmw_ref,
    ln2_w_ref,
    ln2_b_ref,
    w1_ref,
    b1_ref,
    w2_ref,
    b2_ref,
    out_ref,
):
    """WHOLE swin block (v3 attention half + LN2/MLP half) in one
    pallas_call: x is read from HBM once and the block output written once —
    the attention residual never round-trips HBM between the halves.
    The LN1 affine is pre-folded into wqkv/bq (see _fold_ln_affine)."""
    from .mlp import gelu_f32

    kb, height, width, c = x_ref.shape
    dt = x_ref.dtype
    _, res = _attn_residual_rows(
        heads, window, shift, eps, grouped,
        x_ref, wqkv_ref, bq_ref, wp_ref, bp_ref, bmw_ref,
    )  # f32 residual

    # MLP half: LN2 + fc1 + exact-GELU(erf poly) + fc2 + residual
    mu2 = jnp.mean(res, axis=-1, keepdims=True)
    var2 = jnp.mean((res - mu2) * (res - mu2), axis=-1, keepdims=True)
    h = (
        (res - mu2)
        * jax.lax.rsqrt(var2 + jnp.float32(eps))
        * ln2_w_ref[:].astype(jnp.float32)
        + ln2_b_ref[:].astype(jnp.float32)
    ).astype(dt)

    def gelu(t):
        return gelu_f32(t, gelu_mode)

    hidden = w1_ref.shape[1]
    nch = _MLP_CHUNKS
    if nch > 1 and (hidden % nch or (hidden // nch) % 128):
        nch = 1  # chunk boundaries must stay 128-lane-aligned
    if nch == 1:
        h1 = gelu(
            jnp.dot(
                h,
                w1_ref[:],
                preferred_element_type=jnp.float32,
                precision=_dot_precision(h, w1_ref[:]),
            )
            + b1_ref[:].astype(jnp.float32)
        )
        h1_dt = h1.astype(dt)
        h2 = jnp.dot(
            h1_dt,
            w2_ref[:],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(h1_dt, w2_ref[:]),
        ) + b2_ref[:].astype(jnp.float32)
    else:
        # Hidden-dim chunking: fc1/GELU/fc2 over independent 128-aligned
        # hidden slices gives Mosaic interleavable MXU (matmuls) and VPU
        # (erf-GELU) chains — the monolithic form serializes the whole
        # (rows, hidden) GELU pass between the two matmuls.  Same products,
        # f32 partial sums reassociated across chunks only.
        hc = hidden // nch
        acc = None
        for j in range(nch):
            w1j = w1_ref[:, j * hc : (j + 1) * hc]
            t1 = gelu(
                jnp.dot(
                    h,
                    w1j,
                    preferred_element_type=jnp.float32,
                    precision=_dot_precision(h, w1j),
                )
                + b1_ref[j * hc : (j + 1) * hc].astype(jnp.float32)
            )
            t1_dt = t1.astype(dt)
            w2j = w2_ref[j * hc : (j + 1) * hc, :]
            pj = jnp.dot(
                t1_dt,
                w2j,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(t1_dt, w2j),
            )
            acc = pj if acc is None else acc + pj
        h2 = acc + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (res + h2).astype(dt).reshape(kb, height, width, c)


# Hidden-dim chunk count for the v4 MLP half (1 = monolithic).  Read once
# at import (jit-cache caveat as AM_TPU_NO_PALLAS).
_MLP_CHUNKS = int(os.environ.get("AM_TPU_MLP_CHUNKS", "1"))


def _mlp_gelu_mode() -> str:
    from .mlp import GELU_MODE

    return GELU_MODE

# VMEM budget for the v4 block-size heuristic.  Measured (scripts/
# probe_v4_kb.py, one-process sweep on v5e, B=128 forward): 48 MB 32.17 ms,
# 24 MB 32.33, 80 MB 35.12 — constant-index weight blocks are NOT re-DMA'd
# per grid step (Mosaic skips copies when the index map output is
# unchanged), and a larger per-step working set degrades scheduling.  48
# stays the default; read once at import (jit-cache caveat as
# AM_TPU_NO_PALLAS).
_V4_VMEM_BUDGET = int(
    os.environ.get("AM_TPU_V4_VMEM_MB", "48")
) * 1024 * 1024


def _kb_for_v4(batch, height, width, c, heads, window, grouped=False) -> int:
    """v3 footprint + the MLP intermediates (rows x 4C f32)."""
    n = window * window
    hn = heads * n
    d = c // heads
    gw = c // _lane_groups_for(heads, d, grouped)
    nw = (height // window) * (width // window)
    per_image = (
        nw * (2 * hn * gw * 2 + n * hn * 10)
        + height * width * c * 4
        + height * width * 4 * c * 6
    )
    kb = 1
    while (
        kb * 2 <= batch
        and batch % (kb * 2) == 0
        and (kb * 2) * per_image <= _V4_VMEM_BUDGET
    ):
        kb *= 2
    return kb


@partial(
    jax.jit,
    static_argnames=("heads", "window", "shift", "eps", "grouped", "gelu", "interpret"),
)
def _swin_block_call_v4(
    x, wqkv, bq, wp, bp, bmw, ln2_w, ln2_b, w1, b1, w2, b2,
    heads, window, shift, eps, grouped, gelu, interpret,
):
    b, height, width, c = x.shape
    kb = _kb_for_v4(b, height, width, c, heads, window, grouped)
    n = window * window
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_swin_block_kernel_v4, heads, window, shift, eps, grouped, gelu),
        grid=(b // kb,),
        in_specs=[
            pl.BlockSpec(
                (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            wspec(wqkv.shape),
            wspec(bq.shape),
            wspec(wp.shape),
            wspec(bp.shape),
            wspec((bmw.shape[0], n, heads * n)),
            wspec(ln2_w.shape),
            wspec(ln2_b.shape),
            wspec(w1.shape),
            wspec(b1.shape),
            wspec(w2.shape),
            wspec(b2.shape),
        ],
        out_specs=pl.BlockSpec(
            (kb, height, width, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, height, width, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wqkv, bq, wp, bp, bmw, ln2_w, ln2_b, w1, b1, w2, b2)


def swin_block_pallas_v4(
    x,
    ln_w,
    ln_b,
    wqkv,
    bq3,
    wp,
    bp,
    bias_mask,
    ln2_w,
    ln2_b,
    w1,
    b1,
    w2,
    b2,
    heads: int,
    window: int,
    shift: int,
    eps: float = 1e-5,
    grouped: bool = False,
    gelu: str | None = None,
    interpret: bool = False,
):
    """Whole swin block (v3 attention + MLP) in one kernel.  Attention
    weight layout as in v3; w1: (C, 4C), w2: (4C, C) input-major.
    ln_w/ln_b may be None when the LN1 affine is already folded into
    wqkv/bq3 (models/htsat._v3_kernel_weights does this).  ``grouped``
    enables the 128-lane head-group score/context path; ``gelu`` the
    in-kernel GELU flavor (default: mlp.GELU_MODE / AM_TPU_GELU)."""
    if ln_w is not None:
        wqkv, bq3 = _fold_ln_affine(ln_w, ln_b, wqkv, bq3)
    nw, h_, n, _ = bias_mask.shape
    bmw = jnp.asarray(bias_mask, jnp.float32).transpose(0, 2, 1, 3).reshape(
        nw, n, h_ * n
    )
    with _x32_scope():
        return _swin_block_call_v4(
            x,
            wqkv,
            jnp.asarray(bq3, jnp.float32),
            wp,
            bp,
            bmw,
            ln2_w,
            ln2_b,
            w1,
            b1,
            w2,
            b2,
            heads,
            window,
            int(shift),
            float(eps),
            bool(grouped),
            gelu or _mlp_gelu_mode(),
            interpret,
        )
