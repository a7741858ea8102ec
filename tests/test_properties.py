"""Property-based tests (hypothesis): randomized block splits, rates, and
parameters must preserve the streaming invariants the whole design rests on.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from cutesdr_tpu.design import plan_decimation
from cutesdr_tpu.design.fir_kaiser import design_lowpass
from cutesdr_tpu.ops import decimator, fastfir, fir, nco, resampler
from cutesdr_tpu.ops.util import first_order_recurrence, sliding_window_max

C128 = jnp.complex128
F64 = jnp.float64

_rng = np.random.default_rng(99)


def _run_split(process, carry, x, cuts):
    """Run a streaming op over x split at the given fractional cut points."""
    idx = sorted({int(c * len(x)) for c in cuts} | {0, len(x)})
    outs = []
    for a, b in zip(idx[:-1], idx[1:]):
        if b > a:
            carry, y = process(carry, x[a:b])
            outs.append(np.asarray(y))
    return np.concatenate(outs) if outs else np.zeros(0)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(0.01, 0.99), min_size=0, max_size=3),
       st.integers(0, 2 ** 32 - 1))
def test_fir_split_invariance(cuts, seed):
    """Any re-blocking of the stream yields identical FIR output."""
    rng = np.random.default_rng(seed)
    taps = design_lowpass(1.0, 50.0, 3000.0, 4000.0, 48000.0)
    x = rng.standard_normal(256)
    p, c0 = fir.init(taps, rdtype=F64)
    full = _run_split(lambda c, b: fir.process_real(p, c, b), c0, x, [])
    _, c1 = fir.init(taps, rdtype=F64)
    split = _run_split(lambda c, b: fir.process_real(p, c, b), c1, x, cuts)
    np.testing.assert_allclose(split, full, rtol=1e-10, atol=1e-12)


@settings(max_examples=15, deadline=None)
@given(st.floats(-0.5, 0.5), st.integers(0, 2 ** 32 - 1))
def test_nco_frequency_accuracy(frac, seed):
    """Mixing a tone at f with an NCO at f lands within fs/2^32 of DC."""
    fs = 1_000_000.0
    f = frac * fs * 0.9
    rngl = np.random.default_rng(seed)
    phase0 = rngl.uniform(0, 2 * np.pi)
    n = 4096
    t = np.arange(n)
    x = np.exp(1j * (phase0 + 2 * np.pi * f / fs * t))
    p, c = nco.init(f, fs)
    _, y = nco.process(p, c, jnp.asarray(x, C128))
    ang = np.unwrap(np.angle(np.asarray(y)))
    residual_hz = abs(ang[-1] - ang[0]) / (2 * np.pi * (n - 1)) * fs
    assert residual_hz < fs / 2 ** 32 + 1e-6


@settings(max_examples=10, deadline=None)
@given(st.sampled_from([2, 3, 5, 8]), st.integers(1, 30))
def test_sliding_window_max_random(window, n_blocks):
    x = _rng.standard_normal(window * n_blocks + 7)
    tail = np.full(window - 1, -99.0)
    got, _ = sliding_window_max(jnp.asarray(x), window, jnp.asarray(tail))
    z = np.concatenate([tail, x])
    want = np.array([z[i:i + window].max() for i in range(len(x))])
    np.testing.assert_allclose(np.asarray(got), want)


@settings(max_examples=10, deadline=None)
@given(st.floats(0.0, 0.999), st.floats(-3.0, 3.0))
def test_first_order_recurrence_random(alpha, s0):
    x = _rng.standard_normal(100)
    got = np.asarray(first_order_recurrence(alpha, jnp.asarray(x), s0))
    s = s0
    for i, v in enumerate(x):
        s = alpha * s + v
        assert abs(got[i] - s) < 1e-6 * max(1.0, abs(s)), i


@settings(max_examples=8, deadline=None)
@given(st.floats(0.2, 3.0), st.integers(0, 2 ** 31))
def test_resampler_output_count_tracks_rate(rate, seed):
    """Total output count over many blocks ~= total_in / rate ± 1."""
    rngl = np.random.default_rng(seed)
    p, c = resampler.init(rate, rdtype=F64)
    n_in = 0
    n_out = 0
    cap = resampler.max_out_for(256, rate)
    for _ in range(10):
        x = rngl.standard_normal(256)
        c, y, nv = resampler.process(p, c, jnp.asarray(x), cap)
        n_in += 256
        n_out += int(nv)
    expect = n_in / rate
    assert abs(n_out - expect) <= 1.5


@settings(max_examples=6, deadline=None)
@given(st.sampled_from([(2e6, 2800.0), (2e6, 20000.0), (614400.0, 9000.0),
                        (1.234e6, 15000.0)]))
def test_plan_properties(args):
    """Planner invariants for arbitrary rates: power-of-2 decimation, output
    covers the bandwidth or hits the rate floor, stages usable at their
    rates."""
    in_rate, bw = args
    p = plan_decimation(in_rate, bw)
    assert p.in_rate / p.out_rate == p.decimation
    from cutesdr_tpu import coefficients as coef
    assert (p.out_rate <= max(bw / coef.HB51TAP_MAX, 15800.0)
            or p.out_rate / 2 < 15800.0)
