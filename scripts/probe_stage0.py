"""Attribute the stage-0 v3 attention block cost across its internal stages.

Runs TRUNCATED copies of the v3 kernel body on the real chip — each variant
stops after one more pipeline stage and reduces whatever it has into the
(kb, h, w, c) output (a per-row broadcast, so nothing is dead-code
eliminated and output traffic is constant across variants).  The deltas
between consecutive variants attribute the per-block time:

    prologue   roll + window transpose + mu/var
    qkv        + fused qkv matmul with the LN fold epilogue
    build      + block-diagonal wide K/V build (the hm broadcast-multiply)
    scores     + QK^T contraction + bias/mask add
    softmax    + max/exp/selector-matmul denominators/div
    ctx        + PV contraction
    full       + output projection, window reverse, roll back, residual

Usage:  python scripts/probe_stage0.py [batch] [iters] [stage] [shift]
"""

import os
import sys
import time
from functools import partial

# Run directly via `python scripts/...` without touching PYTHONPATH
# (which must keep /root/.axon_site for the TPU backend - see CLAUDE.md).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("AM_TPU_COMPILE_CACHE", "1")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import audio_metrics_tpu  # noqa: F401
from audio_metrics_tpu.ops.attention import (
    _kb_for_v3,
    _lane_groups_for,
    _x32_scope,
)


def _kernel(heads, window, shift, eps, stop, *refs):
    # operand set varies per stop (Mosaic failed to legalize kernels with
    # unread refs: func.return error), so unpack by name
    names = _OPERANDS[stop]
    out_ref = refs[-1]
    by = dict(zip(names, refs[:-1]))
    x_ref = by["x"]
    wqkv_ref = by.get("wqkv")
    bq_ref = by.get("bq")
    wp_ref = by.get("wp")
    bp_ref = by.get("bp")
    bmw_ref = by.get("bmw")
    kb, height, width, c = x_ref.shape
    n = window * window
    hb, wb = height // window, width // window
    g = kb * hb * wb
    rows = kb * height * width
    dt = x_ref.dtype

    def emit(t2d):
        """Write a lane-broadcast slice of the intermediate into the fixed
        output shape — keeps the variant's ops live (op-level DCE can't
        drop a partially read matmul/multiply), works for any intermediate
        wider/narrower than c, and adds the same (rows, c) write that every
        other variant pays."""
        r = t2d[: kb * height * width, :1].astype(jnp.float32)
        out_ref[:] = (
            jnp.broadcast_to(r, (kb * height * width, c))
            .astype(dt)
            .reshape(kb, height, width, c)
        )

    xin = x_ref[:].reshape(rows, c)
    x4 = xin.reshape(kb, height, width, c)
    if shift:
        xi = pltpu.bitcast(x4, jnp.int32)
        xi = pltpu.roll(xi, height - shift, 1)
        xi = pltpu.roll(xi, (width - shift) // 2, 2)
        x4 = pltpu.bitcast(xi, dt)
    xw = (
        x4.reshape(kb, hb, window, wb, window, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(g * n, c)
    )
    xwf = xw.astype(jnp.float32)
    mu = jnp.mean(xwf, axis=-1, keepdims=True)
    var = jnp.mean((xwf - mu) * (xwf - mu), axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var + jnp.float32(eps))
    if stop == "prologue":
        return emit(xw * rs)
    csum = jnp.sum(wqkv_ref[:].astype(jnp.float32), axis=0)

    y = (
        jnp.dot(xw, wqkv_ref[:], preferred_element_type=jnp.float32) * rs
        - (rs * mu) * csum[None, :]
        + bq_ref[:].astype(jnp.float32)
    ).astype(dt)
    if stop == "qkv":
        return emit(y)
    q = y[:, :c].reshape(g, n, c)
    k = y[:, c : 2 * c].reshape(g, n, c)
    v = y[:, 2 * c :].reshape(g, n, c)

    d = c // heads
    ngroups = _lane_groups_for(heads, d, True)
    gh = heads // ngroups
    gw = gh * d
    gn = gh * n
    hm = (
        jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gw), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (gh, 1, gw), 2) // d
    ).astype(dt)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (gn, gh), 0) // n
        == jax.lax.broadcasted_iota(jnp.int32, (gn, gh), 1)
    ).astype(jnp.float32)

    parts = []
    for j in range(ngroups):
        qg = q[:, :, j * gw : (j + 1) * gw]
        kg = k[:, :, j * gw : (j + 1) * gw]
        vg = v[:, :, j * gw : (j + 1) * gw]
        kw = (kg[:, None] * hm[None]).reshape(g, gn, gw)
        vw = (vg[:, None] * hm[None]).reshape(g, gn, gw)
        if stop == "build":
            return emit((kw + vw).reshape(g * gn, gw))
        s = jax.lax.dot_general(
            qg, kw,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        bg = bmw_ref[:, :, j * gn : (j + 1) * gn]
        if bmw_ref.shape[0] == 1:
            s = s + bg[0][None]
        else:
            s = (s.reshape(kb, bmw_ref.shape[0], n, gn) + bg[None]).reshape(
                g, n, gn
            )
        if stop == "scores":
            return emit(s.reshape(g * n, gn))
        # production (reduce-free) softmax — keep in sync with attention.py
        e = jnp.exp(jnp.clip(s, -80.0, 80.0))
        den = jax.lax.dot_general(
            e, sel, dimension_numbers=(((2,), (0,)), ((), ()))
        )
        rw = jax.lax.dot_general(
            1.0 / den, sel, dimension_numbers=(((2,), (1,)), ((), ()))
        )
        p = (e * rw).astype(dt)
        if stop == "softmax":
            return emit(p.reshape(g * n, gn))
        parts.append(
            jax.lax.dot_general(
                p, vw,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    ctx = parts[0] if ngroups == 1 else jnp.concatenate(parts, axis=-1)
    if stop == "ctx":
        return emit(ctx.reshape(g * n, c))
    ow = (
        jnp.dot(
            ctx.reshape(g * n, c).astype(dt),
            wp_ref[:],
            preferred_element_type=jnp.float32,
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
        (o4.reshape(rows, c) + xin.astype(jnp.float32))
        .astype(dt)
        .reshape(kb, height, width, c)
    )


_OPERANDS = {
    "prologue": ("x",),
    "qkv": ("x", "wqkv", "bq"),
    "build": ("x", "wqkv", "bq"),
    "scores": ("x", "wqkv", "bq", "bmw"),
    "softmax": ("x", "wqkv", "bq", "bmw"),
    "ctx": ("x", "wqkv", "bq", "bmw"),
    "full": ("x", "wqkv", "bq", "wp", "bp", "bmw"),
}


@partial(jax.jit, static_argnames=("heads", "window", "shift", "stop"))
def _call(x, wqkv, bq, wp, bp, bmw, heads, window, shift, stop):
    b, height, width, c = x.shape
    # kb=1: the truncated variants change Mosaic's liveness enough that the
    # production kb=2 blows the 16M scoped-vmem stack; attribution only needs
    # consistent deltas, so run everything at kb=1
    kb = 1
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    allops = {"x": x, "wqkv": wqkv, "bq": bq, "wp": wp, "bp": bp, "bmw": bmw}
    ops = [allops[nm] for nm in _OPERANDS[stop]]
    specs = [
        pl.BlockSpec(
            (kb, height, width, c),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + [wspec(a.shape) for a in ops[1:]]
    return pl.pallas_call(
        partial(_kernel, heads, window, shift, 1e-5, stop),
        grid=(b // kb,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (kb, height, width, c),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(*ops)


STOPS = ["prologue", "qkv", "build", "scores", "softmax", "ctx", "full"]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    stage = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    shift = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    res = 64 >> stage
    c = 128 << stage
    heads = (4, 8, 16, 32)[stage]
    window = min(8, res)
    n = window * window
    nw = (res // window) ** 2
    gh = min(heads, 128 // (c // heads))
    gn = gh * n  # one group's wide width; bmw carries ALL heads (hn wide)
    hn = heads * n

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(b, res, res, c)), dt)
    wqkv = jnp.asarray(0.05 * rng.normal(size=(c, 3 * c)), dt)
    bq = jnp.asarray(rng.normal(size=(3 * c,)), jnp.float32)
    wp = jnp.asarray(0.05 * rng.normal(size=(c, c)), dt)
    bp = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    nbm = nw if shift else 1
    bmw = jnp.asarray(rng.normal(size=(nbm, n, hn)), jnp.float32)

    prev = 0.0
    for stop in STOPS:
      with _x32_scope():
            out = _call(x, wqkv, bq, wp, bp, bmw, heads, window, shift, stop)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = _call(x, wqkv, bq, wp, bp, bmw, heads, window, shift, stop)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            dtm = (time.perf_counter() - t0) / iters * 1e3
            print(
                f"stage{stage} shift={shift} {stop:9s} {dtm:7.3f} ms"
                f"  (+{dtm - prev:6.3f})",
                flush=True,
            )
            prev = dtm


if __name__ == "__main__":
    main()
