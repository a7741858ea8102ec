"""Generate the REFERENCE-BINARY golden fixtures (VERDICT r3 item 2).

For every committed recorded-IQ fixture (tests/fixtures/golden_<name>.npz)
this drives the reference's OWN compiled DSP chain — /root/reference/dsp/*.cpp
built unmodified by tests/ref_harness (CDownConvert → CFastFIR → CSMeter →
CAgc → C{Am,Sam,Fm,Ssb}Demod, dsp/demodulator.cpp:163-215) — with the same
IQ, and pins its float64 audio on disk (tests/fixtures/refgold_<name>.npz).

tests/test_refgold_fixtures.py then asserts BOTH our pinned f64-oracle audio
and the f32 production chain against these dumps, so a misreading of the
reference C++ that our re-derived oracles share can no longer hide: the
truth source is the reference binary itself (BASELINE.md north star:
"must match the reference C++ chain").

Known, analytically-documented convention differences compensated at the
INPUT (the front end is linear up to the AGC, so a constant complex factor
on the stimulus cancels the reference's mixer convention exactly):

  * the reference's self-normalizing quadrature NCO
    (dsp/downconvert.cpp:212-218) settles to amplitude sqrt(0.95) — the
    fixed point of its `OscGn = 1.95 - |osc|^2` gain law — not 1.0;
  * its oscillator output leads by one NCO increment (the rotation is
    applied before the first output sample), i.e. a constant phase
    e^{j*NcoInc} with NcoInc = 2*pi*(-tune + cw_offset)/fs.

We therefore feed the reference  x * e^{-j*NcoInc} / sqrt(0.95)  so its
post-mixer signal equals our chain's (verified: P1 matches our f64 cascade
at ~149 dB SNR after this factor).  The residual oscillator amplitude
settling transient (~first 100 samples, starts at 1.0) falls inside the
skip window every fixture already carries.

Run AFTER make_golden.py:   python tests/make_refgold.py
Requires the harness:       make -C tests/ref_harness
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig  # noqa: E402

FIXDIR = os.path.join(_HERE, "fixtures")
HARNESS = os.path.join(_HERE, "ref_harness", "build", "refchain")
NAMES = ("usb", "lsb", "cwu", "am", "sam", "fm", "usb2m")
MODE_ID = {"am": 0, "sam": 1, "fm": 2, "usb": 3, "lsb": 4, "cwu": 5,
           "cwl": 6}
OSC_AMP = np.sqrt(0.95)          # quadrature-osc settled amplitude


def run_reference(cfg: ReceiverConfig, x: np.ndarray, workdir: str,
                  stereo: bool = False):
    """Drive the compiled reference chain; returns (audio_f64, taps dict).
    With ``stereo`` the audio comes back [n, 2] (left, right) from the
    reference's stereo ProcessData overload (dsp/demodulator.cpp:221-273)."""
    nco_inc = 2 * np.pi * (-cfg.tune_freq + cfg.cw_offset) / cfg.input_rate
    comp = np.exp(-1j * nco_inc) / OSC_AMP
    xc = x.astype(np.complex128) * comp
    iq = np.empty(2 * len(xc), np.float64)
    iq[0::2] = xc.real
    iq[1::2] = xc.imag
    iq_path = os.path.join(workdir, "in.iq.f64")
    iq.tofile(iq_path)
    prefix = os.path.join(workdir, "out")
    subprocess.run(
        [HARNESS, iq_path, repr(cfg.input_rate), repr(-cfg.tune_freq),
         str(MODE_ID[cfg.mode]), str(int(cfg.low_cut)),
         str(int(cfg.hi_cut)), str(int(cfg.cw_offset)),
         "1" if cfg.agc_on else "0", str(int(cfg.agc_thresh_db)),
         str(int(cfg.agc_decay_ms)), prefix]
        + (["1"] if stereo else []),
        check=True, capture_output=True)
    audio = np.fromfile(prefix + ".audio.f64")
    if stereo:
        audio = audio.reshape(-1, 2)
    taps = {}
    for tag in ("p1", "p2", "p3"):
        v = np.fromfile(f"{prefix}.{tag}.f64")
        taps[tag] = v[0::2] + 1j * v[1::2]
    return audio, taps


def production_audio(cfg, d, n_blocks):
    import jax.numpy as jnp
    rx = Receiver(cfg)
    got = []
    for b in range(n_blocks):
        sl = slice(b * cfg.block_size, (b + 1) * cfg.block_size)
        out = rx.process(jnp.asarray(
            d["iq_re"][sl] + 1j * d["iq_im"][sl], jnp.complex64))
        got.append(np.asarray(out.audio, np.float64))
    return np.concatenate(got)


def snr_db(want, got, skip):
    n = min(len(want), len(got))
    err = got[skip:n] - want[skip:n]
    return 10 * np.log10(np.mean(want[skip:n] ** 2)
                         / max(np.mean(err ** 2), 1e-30))


def make_sam_stereo():
    """Stereo SAM cross-check: the reference's Hilbert sideband splitter
    (dsp/samdemod.cpp:149-156, LSB->left/USB->right) vs our production
    stereo chain — no oracle in the loop, the reference binary is the
    truth.  Stimulus: carrier at the tune frequency + distinct USB/LSB
    tones so channel separation is falsifiable."""
    import jax.numpy as jnp

    cfg = ReceiverConfig(input_rate=250_000.0, mode="sam",
                         tune_freq=60_000.0, audio_rate=None, stereo=True,
                         agc_on=True, agc_thresh_db=-90.0)
    n_blocks = 8
    n = cfg.block_size * n_blocks
    fs = cfg.input_rate
    t = np.arange(n) / fs
    x = (6000.0 * np.exp(2j * np.pi * 60_000.0 * t)
         + 1500.0 * np.exp(2j * np.pi * (60_000.0 + 1200.0) * t)
         + 1500.0 * np.exp(2j * np.pi * (60_000.0 - 700.0) * t)
         ).astype(np.complex64)
    with tempfile.TemporaryDirectory() as wd:
        ref_audio, _ = run_reference(cfg, x, wd, stereo=True)

    rx = Receiver(cfg)
    got = []
    for b in range(n_blocks):
        out = rx.process(jnp.asarray(
            x[b * cfg.block_size:(b + 1) * cfg.block_size]))
        a = np.asarray(out.audio)
        got.append(np.stack([a.real, a.imag], axis=-1).astype(np.float64))
    got = np.concatenate(got)

    skip = len(ref_audio) // 2
    m = min(len(ref_audio), len(got))
    err = got[skip:m] - ref_audio[skip:m]
    snr = 10 * np.log10(np.mean(ref_audio[skip:m] ** 2)
                        / max(np.mean(err ** 2), 1e-30))
    meta = dict(mode="sam", stereo=True, input_rate=cfg.input_rate,
                tune_freq=cfg.tune_freq, n_blocks=n_blocks, skip=skip,
                measured_snr_prod_db=round(snr, 1),
                min_snr_prod_db=round(snr - 8.0, 1))
    np.savez_compressed(
        os.path.join(FIXDIR, "refgold_sam_stereo.npz"),
        iq_re=np.real(x).astype(np.float32),
        iq_im=np.imag(x).astype(np.float32),
        audio=ref_audio, meta=json.dumps(meta))
    print(f"sam_stereo: ref audio {ref_audio.shape}, "
          f"f32-prod-vs-ref {snr:.1f} dB")


def make_fft_display():
    """Display-path cross-check: the reference's fused CFft display half
    (Hann window + averaging + K_B/K_C dB cal + I/Q-swap quirk + bin->
    pixel max-hold) driven by the reference binary itself (reffft) on a
    two-tone + noise stimulus; its integer pixel map is pinned.  Our
    un-fused path must reproduce it within 1 pixel with the documented
    +6.02 dB calibration quirk re-applied (SpectrumConfig docstring: the
    reference calibrates against N*A/2 while applying gain-2 windows)."""
    fs = 2_000_000.0
    N, ave, frames = 4096, 4, 16
    rng = np.random.default_rng(11)
    t = np.arange(N * frames) / fs
    x = (9000.0 * np.exp(2j * np.pi * 250e3 * t)
         + 900.0 * np.exp(-2j * np.pi * 614e3 * t)
         + 40.0 * (rng.standard_normal(N * frames)
                   + 1j * rng.standard_normal(N * frames)))
    fftbin = os.path.join(_HERE, "ref_harness", "build", "reffft")
    with tempfile.TemporaryDirectory() as wd:
        iq = np.empty(2 * len(x))
        iq[0::2], iq[1::2] = x.real, x.imag
        iq.tofile(os.path.join(wd, "in.f64"))
        subprocess.run(
            [fftbin, os.path.join(wd, "in.f64"), str(N), str(ave), "0.0",
             repr(fs), "0.0", "-120.0", "1024", "200",
             os.path.join(wd, "out")], check=True, capture_output=True)
        ref_pix = np.fromfile(os.path.join(wd, "out.pix.i32"), np.int32)
    meta = dict(fft_size=N, ave_size=ave, frames=frames, sample_rate=fs,
                max_db=0.0, min_db=-120.0, width=1024, height=200)
    np.savez_compressed(
        os.path.join(FIXDIR, "refgold_fftdisp.npz"),
        iq_re=np.real(x).astype(np.float32),
        iq_im=np.imag(x).astype(np.float32),
        pix=ref_pix, meta=json.dumps(meta))
    print(f"fftdisp: {len(ref_pix)} reference pixel heights pinned")


def make_misc_ops():
    """Per-op cross-checks for the two components outside the
    CDemodulator chain: the fractional resampler (truncating-table sinc,
    dsp/fractresampler.cpp) and the impulse noise blanker
    (dsp/noiseproc.cpp), each driven by the reference binary (refmisc)
    and pinned."""
    miscbin = os.path.join(_HERE, "ref_harness", "build", "refmisc")
    fs_in, fs_out = 62500.0, 48000.0
    rate = fs_in / fs_out
    n, chunk = 32768, 2048
    t = np.arange(n) / fs_in
    x = 8000.0 * np.exp(2j * np.pi * 1000.0 * t)
    with tempfile.TemporaryDirectory() as wd:
        iq = np.empty(2 * n)
        iq[0::2], iq[1::2] = x.real, x.imag
        iq.tofile(os.path.join(wd, "in.f64"))
        subprocess.run([miscbin, "resamp", os.path.join(wd, "in.f64"),
                        repr(rate), str(chunk), os.path.join(wd, "rs")],
                       check=True, capture_output=True)
        raw = np.fromfile(os.path.join(wd, "rs.out.f64"))
    np.savez_compressed(
        os.path.join(FIXDIR, "refgold_resampler.npz"),
        iq_re=np.real(x).astype(np.float32),
        iq_im=np.imag(x).astype(np.float32),
        out_re=raw[0::2], out_im=raw[1::2],
        meta=json.dumps(dict(rate=rate, chunk=chunk, skip=100)))
    print(f"resampler: {len(raw)//2} reference output samples pinned")

    rng = np.random.default_rng(5)
    xb = 300.0 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    imp = rng.integers(0, n, 12)
    xb[imp] += 30000.0
    thresh_ui, width_us = 50.0, 50.0
    with tempfile.TemporaryDirectory() as wd:
        iq = np.empty(2 * n)
        iq[0::2], iq[1::2] = xb.real, xb.imag
        iq.tofile(os.path.join(wd, "in.f64"))
        subprocess.run([miscbin, "blanker", os.path.join(wd, "in.f64"),
                        repr(thresh_ui), repr(width_us), repr(fs_in),
                        os.path.join(wd, "nb")],
                       check=True, capture_output=True)
        raw = np.fromfile(os.path.join(wd, "nb.out.f64"))
    np.savez_compressed(
        os.path.join(FIXDIR, "refgold_blanker.npz"),
        iq_re=np.real(xb).astype(np.float32),
        iq_im=np.imag(xb).astype(np.float32),
        out_re=raw[0::2], out_im=raw[1::2],
        meta=json.dumps(dict(threshold=thresh_ui, width_us=width_us,
                             fs=fs_in, chunk=2048, skip=1024)))
    print(f"blanker: {len(raw)//2} reference output samples pinned "
          f"({int(np.sum((raw[0::2]==0)&(raw[1::2]==0)))} blanked)")


def main():
    if not os.path.exists(HARNESS):
        subprocess.run(["make", "-C", os.path.join(_HERE, "ref_harness")],
                       check=True)
    only = set(sys.argv[1:])        # optional fixture-name filter
    if not only:
        make_sam_stereo()
        make_fft_display()
        make_misc_ops()
    for name in (n for n in NAMES if not only or n in only):
        d = np.load(os.path.join(FIXDIR, f"golden_{name}.npz"))
        meta = json.loads(str(d["meta"]))
        cfg = ReceiverConfig(input_rate=meta["input_rate"],
                             mode=meta["mode"],
                             tune_freq=meta["tune_freq"],
                             cw_offset=meta["cw_offset"],
                             audio_rate=None, agc_on=True,
                             agc_thresh_db=-90.0)
        x = d["iq_re"].astype(np.float64) + 1j * d["iq_im"].astype(np.float64)
        with tempfile.TemporaryDirectory() as wd:
            ref_audio, taps = run_reference(cfg, x, wd)

        oracle = d["audio"]
        skip = int(meta["skip"])
        # the streams must already be aligned (verified: P1 matches at lag
        # 0); guard against a silent offset with a correlation check
        n = min(len(ref_audio), len(oracle))
        c = np.correlate(ref_audio[skip:n], oracle[skip:n], "full")
        lag = int(np.argmax(np.abs(c)) - (n - skip - 1))
        assert lag == 0, f"{name}: unexpected audio lag {lag}"

        snr_oracle = snr_db(ref_audio, oracle, skip)
        prod = production_audio(cfg, d, meta["n_blocks"])
        snr_prod = snr_db(ref_audio, prod, skip)

        # pin bounds with margin: generous for the f32 chain (quantization),
        # tight for the f64 oracle (semantics)
        meta_out = dict(
            mode=meta["mode"], input_rate=meta["input_rate"],
            tune_freq=meta["tune_freq"], cw_offset=meta["cw_offset"],
            skip=skip, n_blocks=meta["n_blocks"],
            measured_snr_oracle_db=round(snr_oracle, 1),
            measured_snr_prod_db=round(snr_prod, 1),
            min_snr_oracle_db=round(snr_oracle - 6.0, 1),
            min_snr_prod_db=round(snr_prod - 8.0, 1),
        )
        np.savez_compressed(
            os.path.join(FIXDIR, f"refgold_{name}.npz"),
            audio=ref_audio, meta=json.dumps(meta_out))
        print(f"{name}: ref audio {len(ref_audio)} samples, "
              f"oracle-vs-ref {snr_oracle:.1f} dB, "
              f"f32-prod-vs-ref {snr_prod:.1f} dB")


if __name__ == "__main__":
    main()
