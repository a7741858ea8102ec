"""Golden-parity regression tests: replay the committed recorded-IQ
fixtures through the f32 production chain and assert SNR against the PINNED
float64-oracle audio (tests/fixtures/golden_<mode>.npz, generated once by
tests/make_golden.py).

This closes the loop BASELINE.md requires — demod audio verified against
the testbench-generator methodology (gui/testbench.cpp:352-447) "within its
SNR/quantization bound" — with the golden audio frozen on disk, so a
regression that shifts the whole chain consistently with a re-derived
oracle still moves a committed number and fails (VERDICT r2 item 2).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
# per-mode fixtures + usb2m (the flagship 2 MSPS ×32-decimation plan)
NAMES = ("usb", "lsb", "cwu", "am", "sam", "fm", "usb2m")


@pytest.mark.parametrize("name", NAMES)
def test_golden_audio_parity(name):
    d = np.load(os.path.join(FIXDIR, f"golden_{name}.npz"))
    meta = json.loads(str(d["meta"]))
    mode = meta["mode"]
    cfg = ReceiverConfig(input_rate=meta["input_rate"], mode=mode,
                         tune_freq=meta["tune_freq"],
                         cw_offset=meta["cw_offset"],
                         audio_rate=None, agc_on=True, agc_thresh_db=-90.0)
    want = d["audio"]
    assert len(want) % meta["n_blocks"] == 0

    rx = Receiver(cfg)
    got = []
    for b in range(meta["n_blocks"]):
        sl = slice(b * cfg.block_size, (b + 1) * cfg.block_size)
        re = jnp.asarray(d["iq_re"][sl])
        im = jnp.asarray(d["iq_im"][sl])
        out = rx.process(jnp.asarray(re + 1j * im, jnp.complex64))
        got.append(np.asarray(out.audio, np.float64))
    got = np.concatenate(got)
    assert got.shape == want.shape

    skip = int(meta["skip"])
    err = got[skip:] - want[skip:]
    snr = 10 * np.log10(np.mean(want[skip:] ** 2)
                        / max(np.mean(err ** 2), 1e-30))
    assert snr > meta["min_snr_db"], (
        f"{mode}: f32 chain vs pinned golden audio SNR {snr:.1f} dB "
        f"(pinned bound {meta['min_snr_db']}, measured at generation "
        f"{meta['measured_snr_db']})")
