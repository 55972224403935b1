"""Brick-wall lookahead peak limiter.

Replaces the reference's compiled ``numpy_audio_limiter.limit`` dependency
(mix_functions.py:270-277,320-326; attack 0.99, release 0.99, delay 527,
threshold 0.5).  The algorithm is the classic delay-line limiter: an envelope
follower (max / exponential-release recurrence), a target gain
``threshold / envelope`` when the envelope exceeds the threshold, a smoothed
gain (one-pole attack recurrence), applied to the signal delayed by ``delay``
samples.

Two implementations:

- "blocked" (default): both recurrences restructured as parallel ops.  The
  envelope ``e[t] = max(|x[t]|, r e[t-1])`` is a MAX-PLUS linear recurrence,
  so ``e[t] = max_k r^k |x[t-k]|`` — per 1024-sample chunk it's a weighted
  cummax, and the cross-chunk carry decays by ``r^1024 ~ 3e-5`` per chunk,
  making the boundary "recursion" a short direct max-convolution (identical
  in f32 after a few chunks).  The gain smoother is a linear one-pole filter
  -> ops/iir.lfilter_blocked (triangular matmuls) + the analytic ``a^(t+1)``
  homogeneous term for the g[-1]=1 initial condition.
- "scan": a single batched ``lax.scan`` over time (kept as the oracle).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .iir import lfilter_blocked

__all__ = ["limit_batch", "limit"]


@partial(jax.jit, static_argnames=("delay", "unroll"))
def _limit_scan(
    x,
    attack_coeff: float,
    release_coeff: float,
    threshold: float,
    delay: int,
    unroll: int = 32,
):
    b_sz, n = x.shape
    # ring buffer of size `delay`: at step i the read slot holds x[i - (delay-1)]
    lag = delay - 1
    delayed = (
        jnp.concatenate([jnp.zeros((b_sz, lag), x.dtype), x[:, :-lag]], 1)
        if lag
        else x
    )

    def step(carry, inp):
        envelope, gain = carry
        sample, delayed_sample = inp
        envelope = jnp.maximum(jnp.abs(sample), envelope * release_coeff)
        target_gain = jnp.where(envelope > threshold, threshold / envelope, 1.0)
        gain = gain * attack_coeff + target_gain * (1.0 - attack_coeff)
        return (envelope, gain), delayed_sample * gain

    init = (jnp.zeros(b_sz, x.dtype), jnp.ones(b_sz, x.dtype))
    _, y = jax.lax.scan(step, init, (x.T, delayed.T), unroll=unroll)
    return y.T


@partial(
    jax.jit,
    static_argnames=("attack_coeff", "release_coeff", "threshold", "delay", "block"),
)
def _limit_blocked(
    x,
    attack_coeff: float,
    release_coeff: float,
    threshold: float,
    delay: int,
    block: int = 1024,
):
    b_sz, n = x.shape
    # the within-chunk weights r^-j must stay finite in f32: cap the chunk
    # so r^-(block-1) < ~1e30 (default r=0.99 allows the full 1024; r=0.9
    # would overflow past ~650 samples)
    max_block = int(30.0 * np.log(10.0) / max(-np.log(release_coeff), 1e-9))
    while block > 16 and block > max_block:
        block //= 2
    r = jnp.float32(release_coeff)
    lag = delay - 1
    delayed = (
        jnp.concatenate([jnp.zeros((b_sz, lag), x.dtype), x[:, :-lag]], 1)
        if lag
        else x
    )

    nb = -(-n // block)
    pad = nb * block - n
    ax = jnp.abs(x)
    if pad:
        ax = jnp.pad(ax, ((0, 0), (0, pad)))
    axr = ax.reshape(b_sz, nb, block)
    j = jnp.arange(block, dtype=jnp.float32)
    # within-chunk zero-history envelope: r^t * cummax(|x_j| r^-j)
    e0 = jax.lax.cummax(axr * (r ** -j), axis=2) * (r**j)
    # cross-chunk carry: E_{i-1} = max_k r^(k*block) u_{i-1-k}; the weights
    # underflow past ~1e-12 relative, so the recursion is a short direct
    # max-convolution (bit-identical once the weight is below f32 resolution
    # of any envelope that could still exceed the threshold)
    u = e0[:, :, -1]
    n_carry = min(nb, int(np.ceil(-12 / np.log10(release_coeff**block))) + 1)
    carry = jnp.zeros((b_sz, nb), jnp.float32)
    for k in range(n_carry):
        shifted = jnp.pad(u, ((0, 0), (k + 1, 0)))[:, :nb]
        carry = jnp.maximum(carry, shifted * jnp.float32(release_coeff ** (k * block)))
    e = jnp.maximum(e0, carry[:, :, None] * (r ** (j + 1.0)))
    e = e.reshape(b_sz, nb * block)[:, :n]

    tg = jnp.where(e > threshold, threshold / jnp.maximum(e, 1e-30), 1.0)
    # one-pole smoothing with g[-1] = 1: zero-state lfilter + a^(t+1)
    g = lfilter_blocked(
        (1.0 - attack_coeff,), (1.0, -attack_coeff), tg
    ) + jnp.float32(attack_coeff) ** (jnp.arange(n, dtype=jnp.float32) + 1.0)
    return delayed * g


def limit_batch(
    signal,
    attack_coeff: float = 0.99,
    release_coeff: float = 0.99,
    delay: int = 527,
    threshold: float = 0.5,
    method: str = "blocked",
):
    """Limit a batch of signals.  signal: (B, n) -> (B, n) float32."""
    x = jnp.asarray(signal, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if method == "blocked":
        y = _limit_blocked(
            x, float(attack_coeff), float(release_coeff), float(threshold), int(delay)
        )
    else:
        y = _limit_scan(
            x, float(attack_coeff), float(release_coeff), float(threshold), int(delay)
        )
    return y[0] if squeeze else y


def limit(signal, attack_coeff=0.99, release_coeff=0.99, delay=527, threshold=0.5):
    """Signature-parity convenience mirroring ``numpy_audio_limiter.limit``
    (operates on (channels, n) float32)."""
    import numpy as np

    return np.asarray(
        limit_batch(signal, attack_coeff, release_coeff, delay, threshold)
    )
