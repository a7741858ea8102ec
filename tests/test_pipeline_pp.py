"""Pipeline parallelism: the 2-stage device pipeline equals the
single-chip receiver with one block of latency (shard/pipeline.py — the
SURVEY §2.4 capability that was document-and-skip in v1)."""

import jax
import jax.numpy as jnp
import numpy as np

from cutesdr_tpu.pipeline.receiver import Receiver, ReceiverConfig
from cutesdr_tpu.shard.pipeline import PipelinedReceiver
from cutesdr_tpu.testbench.generators import tone

C64 = jnp.complex64


def test_pipelined_matches_single_chip_with_one_block_delay():
    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=48000.0)
    devs = jax.devices()
    assert len(devs) >= 2
    pp = PipelinedReceiver(cfg, device_front=devs[0], device_back=devs[1])
    single = Receiver(cfg)

    n_blocks = 4
    x = tone(cfg.block_size * n_blocks, 61_000.0, cfg.input_rate, -20.0)
    got, want = [], []
    for b in np.split(x, n_blocks):
        bj = jnp.asarray(b, C64)
        out = pp.process(bj)
        if out is not None:
            got.append(np.asarray(out.audio)[:int(out.n_audio)])
        o = single.process(bj)
        want.append(np.asarray(o.audio)[:int(o.n_audio)])
    out = pp.flush()
    got.append(np.asarray(out.audio)[:int(out.n_audio)])
    got, want = np.concatenate(got), np.concatenate(want)
    assert got.shape == want.shape
    # stage homes actually differ
    assert pp._staged is None
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_pipelined_stage_placement():
    cfg = ReceiverConfig(input_rate=250_000.0, mode="usb",
                         tune_freq=60_000.0, audio_rate=None)
    devs = jax.devices()
    pp = PipelinedReceiver(cfg, device_front=devs[0], device_back=devs[1])
    x = jnp.asarray(tone(cfg.block_size, 61_000.0, cfg.input_rate, -20.0),
                    C64)
    pp.process(x)
    pp.process(x)
    # front carries live on device 0, back carries on device 1
    front_dev = list(pp.front_state["chan_filter"].tail.devices())[0]
    back_dev = list(pp.back_state["agc"].attack_ave.devices())[0]
    assert front_dev == devs[0] and back_dev == devs[1]
    assert list(pp._staged.devices())[0] == devs[1]
