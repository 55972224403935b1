"""Fused Swin MLP-half Pallas kernel (LN + fc1 + GELU + fc2 + residual).

Counterpart of the torch MLP in the reference's laion_clap HTSAT tower
(SURVEY.md component 14).  XLA runs this as four separate HBM round-trips
(LN, fc1 out at 4x width, gelu+fc2, residual); fusing them keeps the 4C-wide
intermediate entirely in VMEM, so HBM sees the block activation once in and
once out plus the weights.  The two matmuls are (tile, C) @ (C, 4C) and
(tile, 4C) @ (4C, C) — full MXU shapes at every HTSAT stage.

Used by models/htsat.py on the TPU backend (all stages); the plain XLA path
remains the fallback (CPU, or AM_TPU_NO_PALLAS=1).
"""

from __future__ import annotations

import contextlib
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mlp_block_pallas", "mlp_block_pallas_int8"]


def _x32_scope():
    if hasattr(jax, "enable_x64"):  # jax >= 0.9
        return jax.enable_x64(False)
    try:
        return jax.experimental.disable_x64()
    except AttributeError:
        return contextlib.nullcontext()


def _tile_rows(rows: int, c: int, itemsize: int) -> int:
    t = 8
    while (
        t * 2 <= rows
        and rows % (t * 2) == 0
        and (t * 2) * c * itemsize <= 2 * 1024 * 1024
        and t * 2 <= 4096
    ):
        t *= 2
    return t


def _erf_f32(x):
    """Mosaic has no erf primitive; Abramowitz & Stegun 7.1.26 (|err| <=
    1.5e-7, i.e. f32-exact for GELU purposes) using only exp/fma."""
    sign = jnp.where(x < jnp.float32(0.0), jnp.float32(-1.0), jnp.float32(1.0))
    ax = jnp.abs(x)
    t = jnp.float32(1.0) / (jnp.float32(1.0) + jnp.float32(0.3275911) * ax)
    poly = t * (
        jnp.float32(0.254829592)
        + t
        * (
            jnp.float32(-0.284496736)
            + t
            * (
                jnp.float32(1.421413741)
                + t * (jnp.float32(-1.453152027) + t * jnp.float32(1.061405429))
            )
        )
    )
    return sign * (jnp.float32(1.0) - poly * jnp.exp(-ax * ax))


# GELU multiplier Phi(x) = 0.5*(1+erf(x/sqrt2)) as an odd degree-17
# polynomial 0.5 + x*P(x^2) on |x| <= 4.5 (input clamped; Phi saturates to
# within 1.75e-5 of 0/1 at the clamp).  Lawson-reweighted Chebyshev fit
# minimizing the ACTIVATION error |x*(Phi_hat-Phi)|: f32-Horner max abs
# error 7.3e-5, max rel 2.7e-4 over all of R (scripts/gen_gelu_poly
# derivation inline in git history) — sub-ULP after the kernels' bf16 cast
# of the hidden tensor.  Why: the exact-erf chain costs a divide + an exp
# per element over the (rows, 4C) f32 hidden tensor (measured erf 1.28 vs
# relu 0.80 ms/blk at stage 0 — VPU passes); this is 10 fma + 2 muls + a
# 2-op clamp, no divide, no exp, no sign select.
_GELU_POLY_B = 4.5
_GELU_POLY = (
    0.39871258,
    -0.06598459,
    0.009585164,
    -0.0010375798,
    8.142333e-05,
    -4.4515587e-06,
    1.590905e-07,
    -3.3143954e-09,
    3.0361026e-11,
)

# Default GELU flavor for the fused kernels: "poly" (the bounded-error
# polynomial above; DEFAULT — measured 36.54 -> 34.05 ms per 128-clip
# forward on v5e, and the <=7.3e-5 activation error is sub-ULP after the
# kernels' bf16 hidden-tensor cast, far inside the package's 1e-4 metric
# parity envelope) or "exact" (erf via A&S 7.1.26; AM_TPU_GELU=exact).
# Read once at import (jit-cache caveat as AM_TPU_NO_PALLAS); call sites
# may override per call.
GELU_MODE = os.environ.get("AM_TPU_GELU", "poly")


def gelu_f32(y, mode: str):
    """y (f32) -> gelu(y) (f32) inside a Pallas kernel."""
    if mode == "poly":
        xc = jnp.clip(y, jnp.float32(-_GELU_POLY_B), jnp.float32(_GELU_POLY_B))
        r = xc * xc
        p = jnp.float32(_GELU_POLY[-1])
        for v in _GELU_POLY[-2::-1]:
            p = p * r + jnp.float32(v)
        return y * (xc * p + jnp.float32(0.5))
    return (
        y
        * jnp.float32(0.5)
        * (jnp.float32(1.0) + _erf_f32(y * jnp.float32(0.7071067811865476)))
    )


def _mlp_kernel(eps: float, gelu: str, x_ref, ln_w_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    dt = x_ref.dtype
    xin = x_ref[:]
    xf = xin.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    xn = (
        (xf - mu) * jax.lax.rsqrt(var + jnp.float32(eps)) * ln_w_ref[:].astype(jnp.float32)
        + ln_b_ref[:].astype(jnp.float32)
    ).astype(dt)
    y = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[
        :
    ].astype(jnp.float32)
    y = gelu_f32(y, gelu)
    z = jnp.dot(y.astype(dt), w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[
        :
    ].astype(jnp.float32)
    out_ref[:] = (z + xf).astype(dt)


@partial(jax.jit, static_argnames=("eps", "gelu", "interpret"))
def _mlp_call(x, ln_w, ln_b, w1, b1, w2, b2, eps, gelu, interpret):
    rows, c = x.shape
    hidden = w1.shape[1]
    t = _tile_rows(rows, c, x.dtype.itemsize)
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_mlp_kernel, eps, gelu),
        grid=(rows // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wspec(ln_w.shape),
            wspec(ln_b.shape),
            wspec((c, hidden)),
            wspec(b1.shape),
            wspec((hidden, c)),
            wspec(b2.shape),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w, ln_b, w1, b1, w2, b2)


def _mlp_kernel_int8(
    eps,
    x_ref,
    ln_w_ref,
    ln_b_ref,
    w1_ref,
    s1_ref,
    b1_ref,
    w2_ref,
    s2_ref,
    b2_ref,
    out_ref,
):
    """int8 variant: both matmuls run on the MXU's int8 path (measured 2.22x
    bf16 FLOPs on v5e, scripts/probe_int8.py).  Weights are per-output-column
    symmetric int8 (scales s1/s2); activations are quantized per row on the
    fly inside the kernel, so the only extra VMEM passes are the two abs-max
    reductions + rounding, and every dequant multiply fuses into the
    bias/GELU/residual passes that already touch those tensors."""
    dt = x_ref.dtype
    xin = x_ref[:]
    xf = xin.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + jnp.float32(eps)) * ln_w_ref[:].astype(
        jnp.float32
    ) + ln_b_ref[:].astype(jnp.float32)
    sx = jnp.maximum(
        jnp.max(jnp.abs(xn), axis=-1, keepdims=True), jnp.float32(1e-12)
    ) * jnp.float32(1.0 / 127.0)
    qx = jnp.round(xn / sx).astype(jnp.int8)
    y = jnp.dot(qx, w1_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (sx * s1_ref[:]) + b1_ref[:].astype(jnp.float32)
    y = y * jnp.float32(0.5) * (jnp.float32(1.0) + _erf_f32(y * jnp.float32(0.7071067811865476)))
    sy = jnp.maximum(
        jnp.max(jnp.abs(y), axis=-1, keepdims=True), jnp.float32(1e-12)
    ) * jnp.float32(1.0 / 127.0)
    qy = jnp.round(y / sy).astype(jnp.int8)
    z = jnp.dot(qy, w2_ref[:], preferred_element_type=jnp.int32).astype(
        jnp.float32
    ) * (sy * s2_ref[:]) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (z + xf).astype(dt)


@partial(jax.jit, static_argnames=("eps", "interpret"))
def _mlp_call_int8(x, ln_w, ln_b, w1, b1, w2, b2, eps, interpret):
    rows, c = x.shape
    hidden = w1.shape[1]

    def quant_cols(w):
        s = jnp.maximum(
            jnp.max(jnp.abs(w), axis=0, keepdims=True), jnp.float32(1e-12)
        ) * jnp.float32(1.0 / 127.0)
        return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s

    w1_q, s1 = quant_cols(w1)
    w2_q, s2 = quant_cols(w2)
    t = _tile_rows(rows, c, x.dtype.itemsize)
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_mlp_kernel_int8, eps),
        grid=(rows // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            wspec(ln_w.shape),
            wspec(ln_b.shape),
            wspec((c, hidden)),
            wspec((1, hidden)),
            wspec(b1.shape),
            wspec((hidden, c)),
            wspec((1, c)),
            wspec(b2.shape),
        ],
        out_specs=pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, ln_w, ln_b, w1_q, s1, b1, w2_q, s2, b2)


def mlp_block_pallas_int8(
    x, ln_w, ln_b, w1, b1, w2, b2, eps: float = 1e-5, interpret=False
):
    """x + fc2(gelu(fc1(LN(x)))) with int8 MXU matmuls (opt-in fast mode).

    Same contract as mlp_block_pallas but w1/w2 are given in f32 (quantized
    per output column inside the jit — XLA CSEs the prep across calls on the
    same weights).  Deviation vs the bf16 kernel is the symmetric-quant
    error: ~0.2-0.5% rms on the MLP branch output, bounded by tests.
    """
    shape = x.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    with _x32_scope():
        out = _mlp_call_int8(
            x.reshape(rows, shape[-1]),
            ln_w,
            ln_b,
            w1,
            b1,
            w2,
            b2,
            float(eps),
            interpret,
        )
    return out.reshape(shape)


def mlp_block_pallas(
    x, ln_w, ln_b, w1, b1, w2, b2, eps: float = 1e-5, gelu: str | None = None,
    interpret=False,
):
    """x + fc2(gelu(fc1(LN(x)))) over the last axis.

    x: (..., C) — leading dims are flattened into the row tile.  w1: (C, 4C),
    w2: (4C, C) (already transposed to input-major), biases f32.  ``gelu``
    selects the in-kernel GELU flavor (default: GELU_MODE / AM_TPU_GELU).
    """
    shape = x.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    with _x32_scope():
        out = _mlp_call(
            x.reshape(rows, shape[-1]),
            ln_w,
            ln_b,
            w1,
            b1,
            w2,
            b2,
            float(eps),
            gelu or GELU_MODE,
            interpret,
        )
    return out.reshape(shape)
