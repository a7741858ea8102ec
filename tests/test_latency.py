"""Latency accounting (design/latency.py): the analytic group-delay budget
must match the measured delay of an impulse driven through the real chain,
and the auto-chooser must pick the sharpest filter that meets a target.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cutesdr_tpu.design.latency import (MIN_NFFT, choose_fastfir_sizes,
                                        latency_report)
from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig


def test_impulse_delay_matches_group_delay_budget():
    """An input impulse must surface in the audio at exactly the modeled
    decimator + channel-filter group delay (ssb demod is Re(), AGC off,
    no resampler — the remaining path is linear)."""
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb", tune_freq=0.0,
                         audio_rate=None, agc_on=False,
                         agc_manual_gain_db=0.0)
    rep = latency_report(cfg)
    gd_out = ((rep["decimator_group_delay"] + rep["fastfir_group_delay"])
              * cfg.output_rate)

    rx = Receiver(cfg)
    x = np.zeros(cfg.block_size * 3, np.complex64)
    x[0] = 1000.0
    audio = np.concatenate(
        [np.asarray(rx.process(jnp.asarray(b)).audio)
         for b in np.split(x, 3)])
    measured = int(np.argmax(np.abs(audio)))
    assert abs(measured - gd_out) <= 2, (measured, gd_out)


def test_latency_report_components():
    cfg = ReceiverConfig(input_rate=2_000_000.0, mode="usb")
    rep = latency_report(cfg)
    assert rep["block_accumulation"] == cfg.block_size / cfg.input_rate
    assert rep["total"] == pytest.approx(sum(
        v for k, v in rep.items() if k != "total"))
    # the queue only appears when asked for
    assert "audio_queue_half_fill" not in rep
    repq = latency_report(cfg, include_queue=True)
    assert repq["audio_queue_half_fill"] == pytest.approx(8192 / 48000.0)


def test_choose_fastfir_sizes_meets_target_and_maximizes_sharpness():
    cfg = ReceiverConfig(input_rate=2_000_000.0, mode="usb")
    # default (2048/1025) latency for this plan is ~100 ms; ask for 25 ms
    tuned = choose_fastfir_sizes(cfg, 25e-3)
    rep = latency_report(tuned)
    assert rep["total"] <= 25e-3
    # the next size up must overshoot (chooser picked the sharpest fit)
    from dataclasses import replace
    bigger = replace(tuned, fastfir_nfft=tuned.fastfir_nfft * 2,
                     fastfir_ntaps=tuned.fastfir_nfft + 1)
    assert latency_report(bigger)["total"] > 25e-3
    assert tuned.fastfir_ntaps == tuned.fastfir_nfft // 2 + 1


def test_choose_fastfir_sizes_runs_end_to_end():
    cfg = ReceiverConfig(input_rate=500_000.0, mode="usb",
                         tune_freq=100_000.0, audio_rate=None, agc_on=False)
    tuned = choose_fastfir_sizes(cfg, 15e-3)
    assert tuned.fastfir_nfft < 2048
    rx = Receiver(tuned)
    from cutesdr_tpu.testbench.generators import GenConfig, SignalGenerator
    gen = SignalGenerator(GenConfig(
        sample_rate=tuned.input_rate, sweep_start_hz=101_000.0,
        sweep_stop_hz=101_000.0, sweep_rate_hz_per_sec=0.0,
        signal_power_db=-20.0, noise_power_db=-120.0))
    x = gen.next_block(tuned.block_size * 6)
    audio = np.concatenate(
        [np.asarray(rx.process(jnp.asarray(b, jnp.complex64)).audio)
         for b in np.split(x, 6)])
    a = audio[len(audio) // 2:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    f_pk = np.argmax(spec) * tuned.output_rate / len(a)
    assert abs(f_pk - 1000.0) < 2 * tuned.output_rate / len(a)


def test_ten_ms_operating_point_golden():
    """The reference's ~10 ms operating point (dsp/demodulator.cpp:145-146),
    which `cli run/serve` now apply by default: the auto-chosen filter must
    meet the latency target AND still hold the passband/stopband/SNR specs
    — a tone in the passband dominates the audio, a tone 3.2 kHz past the
    high edge is rejected >= 60 dB."""
    base = ReceiverConfig(input_rate=2_000_000.0, mode="usb",
                          low_cut=100.0, hi_cut=2800.0, agc_on=False,
                          tune_freq=100_000.0, audio_rate=None)
    cfg = choose_fastfir_sizes(base, 10e-3)
    assert latency_report(cfg)["total"] <= 10e-3
    assert cfg.fastfir_nfft < 2048            # actually shrank

    from cutesdr_tpu.testbench.generators import tone

    def audio_power(f_offset_hz, nblocks=6):
        rx = Receiver(cfg)
        x = tone(cfg.block_size * nblocks, 100_000.0 + f_offset_hz,
                 cfg.input_rate, power_db=-20.0)
        audio = np.concatenate(
            [np.asarray(rx.process(jnp.asarray(b, jnp.complex64)).audio)
             for b in np.split(x, nblocks)])
        a = audio[len(audio) // 3:]
        return float(np.mean(a ** 2) + 1e-30), a

    p_pass, a_pass = audio_power(1500.0)
    p_stop, _ = audio_power(6000.0)
    # stopband rejection
    assert 10 * np.log10(p_stop / p_pass) < -60.0
    # passband tone SNR: the 1.5 kHz tone dominates its own audio
    spec = np.abs(np.fft.rfft(a_pass * np.hanning(len(a_pass)))) ** 2
    f = np.fft.rfftfreq(len(a_pass), 1.0 / cfg.output_rate)
    tone_bins = np.abs(f - 1500.0) <= 12 * cfg.output_rate / len(a_pass)
    snr = 10 * np.log10(spec[tone_bins].sum() / spec[~tone_bins].sum())
    assert snr > 40.0, snr


def test_ensure_realtime_blocks_escalates_on_slow_readback():
    """The D2H-floor self-defense (VERDICT r4 #3): with a fake 30 ms
    readback floor, a ~10 ms-block config must escalate until one block
    covers floor*margin; with a microsecond floor it must be untouched."""
    from cutesdr_tpu.design.latency import ensure_realtime_blocks
    cfg = ReceiverConfig(input_rate=2_000_000.0, mode="usb")
    small = choose_fastfir_sizes(cfg, 10e-3)
    assert small.latency_sec < 30e-3
    grown, after = ensure_realtime_blocks(small, 30e-3)
    assert after >= 2 * 30e-3
    assert grown.latency_sec == after
    # sharpness (filter sizes) preferred unchanged: escalation batches
    # frames first
    assert grown.fastfir_nfft == small.fastfir_nfft
    untouched, after2 = ensure_realtime_blocks(small, 5e-6)
    assert untouched == small and after2 == small.latency_sec


def test_cli_config_self_defends_against_readback_floor(capsys):
    """cli run/serve configs must auto-raise the latency target when the
    injected readback floor would starve the audio queue, and say so."""
    import argparse
    from cutesdr_tpu.cli import _cfg_from_args
    args = argparse.Namespace(
        fs=2_000_000.0, mode="usb", freq=100_000.0, low_cut=None,
        hi_cut=None, cw_offset=0.0, agc_off=False, nb_on=False,
        nb_threshold=0.0, nb_width_us=100.0, squelch=0,
        fm_deemphasis_us=0.0, stereo=False, front_dtype="f32",
        target_latency_ms=-1.0)
    cfg = _cfg_from_args(args, readback_floor_s=30e-3)
    assert cfg.latency_sec >= 60e-3
    err = capsys.readouterr().err
    assert "readback floor" in err and "raising blocks" in err
    # fast attached-hardware floor: the 10 ms default survives
    cfg2 = _cfg_from_args(args, readback_floor_s=10e-6)
    assert cfg2.latency_sec <= 12e-3


def test_choose_fastfir_sizes_unreachable_target_raises():
    cfg = ReceiverConfig(input_rate=100_000.0, mode="usb")
    with pytest.raises(ValueError, match="unreachable"):
        choose_fastfir_sizes(cfg, 1e-4)
    # sanity: MIN_NFFT is what sets the floor
    assert MIN_NFFT == 128
