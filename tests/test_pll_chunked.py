"""Chunked guess-verify PLL tier (ops/pll.chunked_scan + demod/fm).

The FM PLL's unlocked worst case (carrier-less noise, the reference's
per-sample serial loop at dsp/fmdemod.cpp:62-89) previously fell back to
the full sequential scan every block.  The chunked tier evaluates the
exact nonlinear recurrence as concurrent chunk scans with warmup halos
and verifies BITWISE state equality at every chunk boundary — sound by
construction (left-to-right induction from the true carry), live because
the clipped fast loop re-synchronizes from any state within ~40 samples.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cutesdr_tpu.demod import fm
from cutesdr_tpu.ops import pll

FS = 62500.0


def _noise(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.standard_normal(n)
                        + 1j * rng.standard_normal(n)).astype(np.complex64))


def test_chunked_matches_scan_bitwise_on_noise():
    params, carry = fm.init(FS)
    theta = jnp.arctan2(_noise(4096).imag, _noise(4096).real)
    ph_s, fr_s, dc_s, audio_s, err_s = fm._pll_scan(params, carry, theta)
    valid, (ph_c, fr_c, dc_c, audio_c, err_c) = fm._pll_chunked(
        params, carry, theta)
    assert bool(valid)
    # state trajectory is exactly the sequential scan's
    assert bool(ph_s == ph_c) and bool(fr_s == fr_c)
    assert bool(jnp.all(err_s == err_c))
    # audio differs only by the parallel-vs-sequential DC EMA rounding
    scale = float(jnp.max(jnp.abs(audio_s))) + 1e-30
    assert float(jnp.max(jnp.abs(audio_s - audio_c))) / scale < 1e-5


def test_chunked_carries_across_blocks():
    """Chained blocks through the public process() (which routes noise
    through the chunked tier) stay within roundoff of a pure-scan chain."""
    params, carry = fm.init(FS)
    c_scan = carry
    x = _noise(3 * 2048, seed=3)
    outs, outs_scan = [], []
    for b in range(3):
        blk = x[b * 2048:(b + 1) * 2048]
        carry, y = fm.process(params, carry, blk)
        th = jnp.arctan2(blk.imag, blk.real)
        ph, fr, dc, audio, _ = fm._pll_scan(params, c_scan, th)
        fc, ic, ave, sq, ys = fm._noise_squelch(params, c_scan, audio)
        ys = fm.ema(params.deemph_alpha, ys, c_scan.deemph)
        c_scan = fm.FmCarry(nco_phase=ph, nco_freq=fr, freq_error_dc=dc,
                            squelch_ave=ave, squelch_on=sq, hp_fir=fc,
                            lp_iir=ic, deemph=ys[..., -1])
        outs.append(np.asarray(y))
        outs_scan.append(np.asarray(ys))
    y = np.concatenate(outs)
    ys = np.concatenate(outs_scan)
    scale = np.max(np.abs(ys)) + 1e-30
    assert np.max(np.abs(y - ys)) / scale < 1e-4


def test_chunked_scan_soundness_under_failed_sync():
    """A deliberately non-synchronizing map (pure integrator — no
    contraction, no rails) must come back invalid, never silently wrong."""
    def step(state, x):
        (s,) = state
        s = s + x
        return (s,), s

    n = 1024
    xs = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                     jnp.float32)
    init = (jnp.asarray(0.0, jnp.float32),)
    guess = (jnp.asarray(123.0, jnp.float32),)   # wrong, and never forgotten
    valid, ys, end = pll.chunked_scan(step, init, guess, xs, 128, 128)
    assert not bool(valid)


def test_chunked_scan_exact_when_guess_is_true_state():
    """With guesses that happen to be exact, outputs equal lax.scan."""
    def step(state, x):
        (s,) = state
        s = 0.5 * s + x
        return (s,), s

    n = 1024
    xs = jnp.asarray(np.random.default_rng(2).standard_normal(n),
                     jnp.float32)
    init = (jnp.asarray(0.0, jnp.float32),)
    valid, ys, end = pll.chunked_scan(step, init, init, xs, 128, 128)
    assert bool(valid)
    ref = jax.lax.scan(step, init, xs)
    assert bool(jnp.all(ys == ref[1]))
    assert bool(end[0] == ref[0][0])


def test_tier_diagnostic_exposed():
    """The executed solver tier is visible (ADVICE r4): noise blocks of a
    chunkable size report TIER_CHUNKED, a clean locked tone reports
    TIER_LINEAR, and the probed receiver surfaces the value — so a silent
    always-fallback regression (e.g. a compiler change breaking the
    bitwise pass-1/pass-2 equality) turns up in metrics, not in lost
    throughput."""
    params, carry = fm.init(FS)
    # noise -> linear solve invalid -> chunked tier validates
    tier_noise = int(fm.last_tier(params, carry, _noise(2048, seed=5)))
    assert tier_noise == fm.TIER_CHUNKED
    # locked tone: run a warmup block first so the loop acquires
    t = np.arange(4096) / FS
    tone = jnp.asarray(np.exp(1j * 2 * np.pi * 150.0 * t)
                       .astype(np.complex64) * 3000)
    carry2, _ = fm.process(params, carry, tone[:2048])
    tier_tone = int(fm.last_tier(params, carry2, tone[2048:]))
    assert tier_tone == fm.TIER_LINEAR
    # probed entry point carries it too
    _, _, _, tier = fm.process_probed(params, carry, _noise(2048, seed=6))
    assert int(tier) == fm.TIER_CHUNKED


def test_fm_batch_noise_routes_through_chunked():
    """Bank path: all-noise bank validates the chunked tier and matches
    per-channel sequential scans at roundoff."""
    nch, n = 4, 2048
    params, carry = fm.init(FS)
    bp = jax.tree_util.tree_map(lambda a: jnp.stack([a] * nch), params)
    bc = jax.tree_util.tree_map(lambda a: jnp.stack([a] * nch), carry)
    x = jnp.stack([_noise(n, seed=10 + i) for i in range(nch)])
    bc2, y = fm.process_batch(bp, bc, x)
    for i in range(nch):
        _, yi = fm.process(params, carry, x[i])
        scale = float(jnp.max(jnp.abs(yi))) + 1e-30
        assert float(jnp.max(jnp.abs(y[i] - yi))) / scale < 1e-4
