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
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mlp_block_pallas"]


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


def _mlp_kernel(eps: float, x_ref, ln_w_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
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
    # erf GELU in f32, matching jax.nn.gelu(approximate=False) to ~1.5e-7
    y = y * jnp.float32(0.5) * (jnp.float32(1.0) + _erf_f32(y * jnp.float32(0.7071067811865476)))
    z = jnp.dot(y.astype(dt), w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[
        :
    ].astype(jnp.float32)
    out_ref[:] = (z + xf).astype(dt)


@partial(jax.jit, static_argnames=("eps", "interpret"))
def _mlp_call(x, ln_w, ln_b, w1, b1, w2, b2, eps, interpret):
    rows, c = x.shape
    hidden = w1.shape[1]
    t = _tile_rows(rows, c, x.dtype.itemsize)
    wspec = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        partial(_mlp_kernel, eps),
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


def mlp_block_pallas(x, ln_w, ln_b, w1, b1, w2, b2, eps: float = 1e-5, interpret=False):
    """x + fc2(gelu(fc1(LN(x)))) over the last axis.

    x: (..., C) — leading dims are flattened into the row tile.  w1: (C, 4C),
    w2: (4C, C) (already transposed to input-major), biases f32.
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
            interpret,
        )
    return out.reshape(shape)
