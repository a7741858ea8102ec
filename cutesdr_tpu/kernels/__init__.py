"""Pallas TPU kernels for the hot front-end ops.

These fuse stages that XLA keeps separate to cut HBM traffic; each kernel
has an XLA-composed reference implementation and equivalence tests (CPU
interpret mode), and bench.py compares both paths on hardware.
"""

from cutesdr_tpu.kernels.mixdec import MixDecimate
