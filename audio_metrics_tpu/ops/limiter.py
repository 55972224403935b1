"""Brick-wall lookahead peak limiter.

Replaces the reference's compiled ``numpy_audio_limiter.limit`` dependency
(mix_functions.py:270-277,320-326; attack 0.99, release 0.99, delay 527,
threshold 0.5).  The algorithm is the classic delay-line limiter: an envelope
follower (max / exponential-release recurrence), a target gain
``threshold / envelope`` when the envelope exceeds the threshold, a smoothed
gain (one-pole attack recurrence), applied to the signal delayed by ``delay``
samples.

On TPU both recurrences run in a single batched ``lax.scan`` over time
(vector ops over the batch at each step, ``unroll`` to amortize loop
overhead); the delay line is a static shift, not a ring buffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

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


def limit_batch(
    signal,
    attack_coeff: float = 0.99,
    release_coeff: float = 0.99,
    delay: int = 527,
    threshold: float = 0.5,
):
    """Limit a batch of signals.  signal: (B, n) -> (B, n) float32."""
    x = jnp.asarray(signal, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    y = _limit_scan(x, float(attack_coeff), float(release_coeff), float(threshold), int(delay))
    return y[0] if squeeze else y


def limit(signal, attack_coeff=0.99, release_coeff=0.99, delay=527, threshold=0.5):
    """Signature-parity convenience mirroring ``numpy_audio_limiter.limit``
    (operates on (channels, n) float32)."""
    import numpy as np

    return np.asarray(
        limit_batch(signal, attack_coeff, release_coeff, delay, threshold)
    )
