"""Pallas TPU kernels for the hot front-end ops.

These fuse stages that XLA keeps separate to cut HBM traffic; each kernel
has an XLA-composed reference implementation and equivalence tests (CPU
interpret mode), and bench.py compares both paths on hardware.
"""

from cutesdr_tpu.kernels import _cachefix

# deterministic Mosaic payloads -> persistent-cache hits for Pallas
# programs (see _cachefix docstring for the diagnosis)
_cachefix.apply()

from cutesdr_tpu.kernels.mixdec import MixDecimate  # noqa: E402
