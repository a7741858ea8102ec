"""Design-math tests: filter responses and the decimation-plan rule."""

import numpy as np
import pytest

from cutesdr_tpu import coefficients as coef
from cutesdr_tpu.design import (design_fastfir, design_highpass,
                                design_lowpass, hilbert_bandpass, izero,
                                kaiser_beta, plan_decimation)
from cutesdr_tpu.design.fastfir_design import CONV_FFT_SIZE
from cutesdr_tpu.design.iir_biquad import biquad_lowpass
from cutesdr_tpu.design.windows import window_table


def freq_response_db(taps, fs, freqs):
    w = np.exp(-2j * np.pi * np.outer(freqs, np.arange(len(taps))) / fs)
    return 20 * np.log10(np.abs(w @ taps) + 1e-300)


def test_izero_matches_scipy_series():
    # spot values of I0 against known results
    assert izero(0.0) == 1.0
    assert np.isclose(izero(1.0), 1.2660658777520084, rtol=1e-8)
    assert np.isclose(izero(5.0), 27.239871823604442, rtol=1e-7)


def test_kaiser_beta_regions():
    assert kaiser_beta(10.0) == 0.0
    assert np.isclose(kaiser_beta(60.0), 0.1102 * (60 - 8.71))
    b40 = kaiser_beta(40.0)
    assert 0 < b40 < kaiser_beta(50.0)


def test_lowpass_meets_spec():
    fs = 15625.0
    taps = design_lowpass(1.0, 50.0, 3000.0, 4000.0, fs)
    assert len(taps) <= 75 and len(taps) >= 3
    # passband ripple small, stopband below -50 dB
    pb = freq_response_db(taps, fs, np.linspace(0, 2800, 50))
    sb = freq_response_db(taps, fs, np.linspace(4200, fs / 2, 50))
    assert np.all(pb > -3.0)
    assert np.all(sb < -45.0)


def test_highpass_meets_spec():
    fs = 15625.0
    taps = design_highpass(1.0, 50.0, 3000.0, 1800.0, fs)
    assert len(taps) % 2 == 1
    pb = freq_response_db(taps, fs, np.linspace(3200, fs / 2 - 100, 50))
    sb = freq_response_db(taps, fs, np.linspace(1, 1600, 50))
    assert np.all(pb > -3.0)
    assert np.all(sb < -45.0)


def test_hilbert_pair_quadrature():
    fs = 31250.0
    lp = design_lowpass(1.0, 40.0, 4500.0, 5500.0, fs)
    hi, hq = hilbert_bandpass(lp, 5000.0, fs)
    # at band center the pair should have equal magnitude, 90 deg apart
    f = 5000.0
    w = np.exp(-2j * np.pi * f * np.arange(len(lp)) / fs)
    ri, rq = w @ hi, w @ hq
    assert np.isclose(abs(ri), abs(rq), rtol=1e-2)
    phase_diff = np.angle(ri / rq)
    assert np.isclose(abs(phase_diff), np.pi / 2, atol=0.02)


def test_fastfir_design_passband_and_scaling():
    fs = 15625.0
    h = design_fastfir(100.0, 2800.0, 0.0, fs)
    assert h.shape == (CONV_FFT_SIZE,)
    # frequency response at bin k corresponds to freq k*fs/N (wrapped);
    # the 1/N scaling means |H| ~ 1/N in the passband
    n = CONV_FFT_SIZE
    f_bins = np.fft.fftfreq(n, 1 / fs)
    pb = (f_bins > 300) & (f_bins < 2600)
    sb = (np.abs(f_bins) > 3500)
    assert np.all(np.abs(h[pb]) * n > 0.7)
    assert np.all(np.abs(h[sb]) * n < 1e-4)   # < -80 dB


def test_halfband_tables_are_halfband():
    for name, taps in coef.HB_TABLES.items():
        L = len(taps)
        center = (L - 1) // 2
        assert taps[center] == 0.5
        odd = np.delete(taps[1::2], center // 2)
        assert np.all(odd == 0.0)
        assert np.allclose(taps, taps[::-1])
        # DC gain 1
        assert np.isclose(taps.sum(), 1.0, atol=2e-7)


def test_halfband_stopband_rejection():
    # each table must reject its aliased band deeply (design target -140 dB;
    # allow margin for table rounding)
    for name, usable, taps in coef.STAGE_MENU:
        if taps is None:
            continue
        fs = 1.0
        f_alias = np.linspace(0.5 - usable, 0.5, 40)
        db = freq_response_db(taps, fs, f_alias)
        assert np.all(db < -130.0), name


def test_plan_rules():
    p = plan_decimation(2_000_000.0, 2800.0)
    assert p.decimation == 128
    assert p.out_rate == 15625.0
    # every stage choice must respect its usable-bandwidth constraint
    f = p.in_rate
    menu = {name: usable for name, usable, _ in coef.STAGE_MENU}
    for s in p.stages:
        assert f >= p.max_bw / menu[s]
        f /= 2
    # output rate floor
    assert p.out_rate > 2800.0 / coef.HB51TAP_MAX or p.out_rate <= 15800.0 * 2


def test_plan_output_rate_floor():
    # huge bandwidth -> no decimation below ~15.8 kHz
    p = plan_decimation(100_000.0, 90_000.0)
    assert p.out_rate >= 7900.0 * 2.0


def test_composed_taps_dc_gain():
    p = plan_decimation(2_000_000.0, 10_000.0)
    h = p.composed_taps()
    assert np.isclose(h.sum(), 1.0, atol=5e-6)


def test_biquad_lowpass_response():
    b0, b1, b2, a1, a2 = biquad_lowpass(3000.0, 1.0, 48000.0)
    w = np.exp(1j * 2 * np.pi * np.array([100.0, 20000.0]) / 48000.0)
    H = (b0 + b1 / w + b2 / w**2) / (1 + a1 / w + a2 / w**2)
    assert abs(H[0]) > 0.95          # passband
    assert abs(H[1]) < 0.1           # stopband


def test_window_tables():
    w = window_table("hann", 512)
    assert np.isclose(w[0], 0.0) and np.isclose(w[256], 1.0, atol=1e-4)
    with pytest.raises(ValueError):
        window_table("nope", 16)
