"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(time: int = 1, channels: int = 1,
              devices=None) -> Mesh:
    """Build a ('t', 'ch') mesh over the available devices.

    't'  — time-axis shards of one wideband stream (halo-exchange parallel)
    'ch' — independent channel banks (embarrassingly parallel)
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    need = time * channels
    if need > len(devices):
        raise ValueError(f"mesh {time}x{channels} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:need]).reshape(time, channels)
    return Mesh(arr, axis_names=("t", "ch"))
