"""Fused swin patch-merging kernel: one VMEM pass per image block.

The conv-form merge in models/htsat._patch_merging (reference counterpart:
laion_clap HTSAT ``PatchMerging`` — 4 strided gathers -> concat -> LN ->
linear) already avoids the materialized gather, but as XLA ops it still
walks the (B, H, W, C) activations three times through HBM: the channel-mean
pass, the centered-second-moment pass, and the stride-2 conv.  At B=128 the
three merges cost 1.21 + 0.50 + 0.22 ms (round-3 close-out ledger) against
an HBM floor of roughly one read + one quarter-size write.

This kernel loads an image block into VMEM ONCE and does everything there:

  - the 2x2/stride-2 gathers become in-VMEM strided slices (sublane selects,
    no HBM relayout),
  - mu / var of the virtual 4C concat row come from lane reductions over the
    four quadrant slices (centered form — the raw E[x^2]-mu^2 form cancels
    catastrophically in f32 when |mean| >> std, same reason
    data.batch_moments centers),
  - the reduction linear runs as four (rows, C) x (C, OC) MXU matmuls
    against the LayerNorm-folded weight blocks (identical algebra to the
    conv form: LN(concat) @ W == rs * sum_j x_j @ (g W)_j - rs*mu*(g @ W)
    + b @ W).

Layout notes (Mosaic): strided slices on >2-D arrays lower to gathers
Mosaic rejects ("Only 2D gather is supported"), so the stride-2 structure is
exposed OUTSIDE the kernel by the free row-major bitcast
``(B, H, W, C) -> (B, H, W/2, 2C)`` (adjacent column pairs land in the lane
axis).  In-kernel, even/odd columns are tile-aligned LANE slices
(``[..., :C]`` / ``[..., C:]``, C a multiple of 128 at every merge), row
pairs come from a MAJOR-axis split of H, and the quadrant flattens merge
major axes only — no gathers, no sublane strides, no lane reshapes.

Gated by AM_TPU_NO_FUSED_MERGE / AM_TPU_NO_PALLAS; models/htsat uses it on
the TPU backend for bf16 compute.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["patch_merge_pallas"]


from .attention import _dot_precision


def _kernel(h, w, eps, x_ref, wg_ref, sv_ref, tv_ref, out_ref):
    ib = x_ref.shape[0]
    c = x_ref.shape[-1] // 2
    oc = out_ref.shape[-1]
    h2, w2 = h // 2, w // 2
    rows = ib * h2 * w2

    # x_ref: (ib, h, w2, 2c) — adjacent column pairs pre-merged into lanes
    # by the caller's free bitcast reshape.  Split row pairs on the MAJOR
    # h axis; even/odd columns are tile-aligned lane slices.
    x = x_ref[...].reshape(ib, h2, 2, w2, 2 * c)
    r0 = x[:, :, 0].reshape(rows, 2 * c)
    r1 = x[:, :, 1].reshape(rows, 2 * c)
    # quadrant j = [x00, x10, x01, x11] in the concat/channel-block order of
    # models/htsat._patch_merging (x_yx: y = row offset, x = col offset)
    quads = (r0[:, :c], r1[:, :c], r0[:, c:], r1[:, c:])

    # LN stats of the virtual (rows, 4C) concat row, centered two-pass
    s = (
        quads[0].astype(jnp.float32)
        + quads[1].astype(jnp.float32)
        + quads[2].astype(jnp.float32)
        + quads[3].astype(jnp.float32)
    )
    mu = jnp.sum(s, axis=-1, keepdims=True) / (4.0 * c)
    m2 = None
    for q in quads:
        t = q.astype(jnp.float32) - mu
        part = jnp.sum(t * t, axis=-1, keepdims=True)
        m2 = part if m2 is None else m2 + part
    rs = jax.lax.rsqrt(m2 / (4.0 * c) + eps)

    # reduction linear on the RAW bf16 quadrants (f32 accumulation), LN
    # applied algebraically afterwards — same association as the conv form
    raw = None
    for j, q in enumerate(quads):
        w_j = wg_ref[j]
        part = jax.lax.dot_general(
            q,
            w_j,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q, w_j),
        )
        raw = part if raw is None else raw + part
    sv = sv_ref[...].reshape(1, oc)
    tv = tv_ref[...].reshape(1, oc)
    out = raw * rs + (tv - mu * rs * sv)
    out_ref[...] = out.reshape(ib, h2 * w2, oc).astype(out_ref.dtype)


def _images_per_block(h: int, w: int, c: int, oc: int, budget: int = 6 << 20):
    # per image: double-buffered bf16 in/out blocks + the f32 temporaries
    # (quadrant sum + centered copy + raw accumulator).  The v5e scoped-vmem
    # stack limit is 18 MB; 6 MB of accounted mass leaves headroom for
    # Mosaic's own scheduling copies (first cut at 24 MB OOM'd: 27.8M > 18M
    # scoped at merge0).
    per_image = 2 * (h * w * c * 2) + 2 * ((h // 2) * (w // 2) * oc * 2)
    per_image += 2 * (h * w * c * 4)
    return max(1, budget // max(per_image, 1))


@partial(jax.jit, static_argnames=("h", "w", "eps", "interpret"))
def patch_merge_pallas(x, wg, svec, tvec, *, h, w, eps, interpret=False):
    """x (B, H*W, C) bf16 -> (B, (H/2)*(W/2), OC) patch-merge + folded LN.

    wg: (4, C, OC) LayerNorm-folded weight blocks (g * W per concat block,
    in [x00, x10, x01, x11] order); svec: (OC,) g @ W; tvec: (OC,) b @ W.
    """
    from jax.experimental import pallas as pl

    from .attention import _x32_scope

    b, n, c = x.shape
    assert n == h * w, (n, h, w)
    oc = wg.shape[-1]
    h2, w2 = h // 2, w // 2
    ib = _images_per_block(h, w, c, oc)
    while b % ib:
        ib -= 1
    grid = (b // ib,)

    # free row-major bitcast: adjacent column pairs -> lane axis (see
    # module docstring; this is what keeps the kernel gather-free)
    x2 = x.reshape(b, h, w2, 2 * c)

    with _x32_scope():
        return pl.pallas_call(
            partial(_kernel, h, w, eps),
            grid=grid,
            in_specs=[
                pl.BlockSpec((ib, h, w2, 2 * c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((4, c, oc), lambda i: (0, 0, 0)),
                pl.BlockSpec((oc,), lambda i: (0,)),
                pl.BlockSpec((oc,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((ib, h2 * w2, oc), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h2 * w2, oc), x.dtype),
            interpret=interpret,
        )(x2, wg, svec, tvec)
