"""Receiver session: wires a sample source (radio / file / generator) to the
TPU pipeline, the spectrum display path, the rate-locked audio queue, and
the metrics registry.

Reference analogue: MainWindow's orchestration (gui/mainwindow.cpp) — create
the interface, wire signals, 200 ms status timer with keepalive every 5
ticks, run/stop logic, live parameter plumbing — minus the Qt widgets.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from cutesdr_tpu.io.audio_sink import RateLockedQueue
from cutesdr_tpu.metrics import StreamMetrics
from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig
from cutesdr_tpu.pipeline.spectrum import SpectrumAnalyzer, SpectrumConfig
from cutesdr_tpu.settings import SessionSettings


@dataclass
class ReceiverSession:
    """Pull-based session: call ``pump()`` with raw IQ blocks (any size);
    it re-blocks to the pipeline's block size, runs the receiver and the
    display FFT, pushes audio into the rate-locked queue, and keeps metrics.

    The audio consumer (sound card thread / WAV writer) calls
    ``audio_queue.get(n)``; its queue-depth P controller feeds back into the
    on-device resampler ratio once per second, closing the reference's
    clock-tracking loop (interface/soundout.cpp:456-468) around the TPU.
    """
    cfg: ReceiverConfig
    spectrum_cfg: Optional[SpectrumConfig] = None
    settings: SessionSettings = field(default_factory=SessionSettings)
    on_spectrum: Optional[Callable[[np.ndarray], None]] = None

    def __post_init__(self):
        import jax.numpy as jnp
        self._jnp = jnp
        self.receiver = Receiver(self.cfg)
        self.receiver.set_volume(self.settings.volume)
        if self.spectrum_cfg is None:
            self.spectrum_cfg = SpectrumConfig(
                fft_size=self.settings.display.fft_size,
                ave_size=self.settings.display.fft_ave,
                sample_rate=self.cfg.input_rate)
        self.analyzer = SpectrumAnalyzer(
            self.spectrum_cfg,
            max_display_rate=self.settings.display.max_display_rate)
        self.audio_queue = RateLockedQueue(stereo=self.cfg.stereo)
        self.metrics = StreamMetrics()
        self._pending = np.zeros(0, np.complex64)
        self._nominal_ratio = (self.cfg.output_rate /
                               (self.cfg.audio_rate or self.cfg.output_rate))
        self._last_correction = 0.0
        self.current_tune = self.cfg.tune_freq
        self.current_low, self.current_hi = self.cfg.low_cut, self.cfg.hi_cut
        self.running = False

    def start(self) -> None:
        self.running = True
        self.metrics = StreamMetrics()

    def stop(self) -> None:
        self.running = False

    # ------------------------------------------------------------- data ---
    def pump(self, iq: np.ndarray) -> int:
        """Feed raw IQ samples; returns number of pipeline blocks run."""
        if not self.running:
            return 0
        jnp = self._jnp
        buf = np.concatenate([self._pending, np.asarray(iq, np.complex64)])
        bs = self.cfg.block_size
        blocks = 0
        while len(buf) >= bs:
            chunk, buf = buf[:bs], buf[bs:]
            # display path uses the raw (pre-mix) stream
            if self.analyzer.feed(chunk) and self.on_spectrum:
                self.on_spectrum(self.analyzer.spectrum_db())
            self.metrics.overload = self.analyzer.overload

            out = self.receiver.process(jnp.asarray(chunk))
            n_aud = int(out.n_audio)
            audio = np.asarray(out.audio)[:n_aud]
            self.audio_queue.put_block(
                np.clip(audio, -32767, 32767).astype(np.int16)
                if not np.iscomplexobj(audio) else
                np.stack([np.clip(audio.real, -32767, 32767),
                          np.clip(audio.imag, -32767, 32767)],
                         axis=-1).astype(np.int16))
            self.metrics.update_block(bs, n_aud,
                                      float(out.smeter_ave_db),
                                      float(out.smeter_peak_db))
            self.metrics.audio_overflows = self.audio_queue.overflows
            self.metrics.audio_underflows = self.audio_queue.underflows
            blocks += 1
        self._pending = buf

        # close the rate-lock loop when the consumer's correction changes
        corr = self.audio_queue.rate_correction
        if corr != self._last_correction and self.cfg.audio_rate:
            self._last_correction = corr
            self.metrics.ppm_error = self.audio_queue.ppm_error
            self.receiver.set_resample_ratio(
                self._nominal_ratio * (1.0 + corr))
        return blocks

    # ---------------------------------------------------------- controls --
    def tune(self, freq_hz: float) -> None:
        self.receiver.set_tune_freq(freq_hz)
        self.current_tune = freq_hz

    def tune_clicked(self, freq_hz: float) -> float:
        """Click-to-tune with the mode's click resolution rounding
        (gui/plotter.cpp roundFreq with m_ClickResolution)."""
        res = max(1, int(self.settings.demod[self.cfg.mode]
                         .filter_click_resolution))
        rounded = round(freq_hz / res) * res
        self.tune(rounded)
        return rounded

    def set_filter(self, low_cut: float, hi_cut: float) -> tuple[float, float]:
        """Set the channel-filter edges, clamped to the mode's limit table
        and mirrored for symmetric modes (the GUI's enforcement in
        gui/mainwindow.cpp:1000-1054 / plotter edge drag).  Returns the
        edges actually applied."""
        from cutesdr_tpu.pipeline.receiver import MODE_LIMITS
        hi_min, hi_max, low_min, low_max, sym = MODE_LIMITS[self.cfg.mode]
        lo = float(min(max(low_cut, low_min), low_max))
        hi = float(min(max(hi_cut, hi_min), hi_max))
        if sym:
            m = max(hi, -lo)
            lo, hi = -m, m
        self.receiver.set_filter(lo, hi)
        self.current_low, self.current_hi = lo, hi
        return lo, hi

    def set_volume(self, vol: int) -> None:
        self.settings.volume = vol
        self.receiver.set_volume(vol)

    def status_line(self) -> str:
        return self.metrics.status_line()
