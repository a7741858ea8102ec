"""Shared helpers for the ops layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def strided_corr(z: jax.Array, taps: jax.Array, stride: int = 1,
                 offset: int = 0) -> jax.Array:
    """Strided sliding-window correlation along the last axis.

    y[..., n] = sum_j taps[j] * z[..., n*stride + offset + j]

    for every n such that the window fits (VALID).  Real dtypes only; complex
    inputs are handled by callers via stacked re/im (TPU convs are real).
    Lowers to ``lax.conv_general_dilated`` (which is itself cross-correlation,
    no kernel flip) and XLA:TPU maps it onto the MXU.  Callers wanting true
    convolution pass ``taps[::-1]``.
    """
    L = taps.shape[0]
    if offset:
        z = z[..., offset:]
    batch_shape = z.shape[:-1]
    t = z.shape[-1]
    zb = z.reshape((-1, 1, t))                       # (N, C=1, W)
    k = taps.astype(z.dtype).reshape((1, 1, L))
    y = lax.conv_general_dilated(
        zb, k, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))
    return y.reshape(batch_shape + (y.shape[-1],))


def complex_strided_corr(z: jax.Array, taps: jax.Array, stride: int = 1,
                         offset: int = 0) -> jax.Array:
    """`strided_corr` for complex ``z`` with real ``taps``: correlate the
    stacked re/im planes in one batched real conv."""
    stacked = jnp.stack([z.real, z.imag], axis=0)
    y = strided_corr(stacked, taps, stride=stride, offset=offset)
    return lax.complex(y[0], y[1])


def first_order_recurrence(alpha, u: jax.Array, s0) -> jax.Array:
    """Parallel (log-depth) solve of s[n] = alpha·s[n-1] + u[n], s[-1] = s0.

    Linear recurrences don't need a serial scan on TPU: with pair elements
    (a, b) and composition (a1,b1)∘(a2,b2) = (a1·a2, a2·b1 + b2), a prefix
    associative_scan yields s[n] = A[n]·s0 + B[n].  ``alpha`` may be a scalar
    or per-sample array.
    """
    a = jnp.broadcast_to(jnp.asarray(alpha, u.dtype), u.shape)

    def combine(l, r):
        return (l[0] * r[0], r[0] * l[1] + r[1])

    A, B = lax.associative_scan(combine, (a, u), axis=-1)
    return A * s0 + B


def ema(alpha, x: jax.Array, init) -> jax.Array:
    """Exponential moving average y[n] = (1-a)·y[n-1] + a·x[n] (parallel)."""
    return first_order_recurrence(1.0 - alpha, alpha * x, init)


def sliding_window_max(x: jax.Array, window: int, init_tail: jax.Array):
    """Max over the trailing ``window`` samples (inclusive of current) for
    each position of ``x``; ``init_tail`` is the window-1 history.  Returns
    (per-sample maxima, new tail).  Uses reduce_window (parallel, no rescan —
    unlike the reference's O(W) peak-expiry search, dsp/agc.cpp:209-231)."""
    z = jnp.concatenate([init_tail, x], axis=-1)
    y = lax.reduce_window(z, -jnp.inf, lax.max, (window,), (1,), "valid")
    return y, z[..., z.shape[-1] - (window - 1):]


def moving_sum(x: jax.Array, window: int, init_tail: jax.Array):
    """Sum over the trailing ``window`` samples (inclusive of current), via
    cumulative-sum difference; ``init_tail`` holds window-1 history samples.
    Returns (per-sample sums, new tail)."""
    z = jnp.concatenate([init_tail, x], axis=-1)
    c = jnp.cumsum(z, axis=-1)
    zero = jnp.zeros(z.shape[:-1] + (1,), z.dtype)
    c = jnp.concatenate([zero, c], axis=-1)
    n = x.shape[-1]
    w = window
    sums = c[..., w:w + n] - c[..., :n]
    return sums, z[..., z.shape[-1] - (w - 1):]
