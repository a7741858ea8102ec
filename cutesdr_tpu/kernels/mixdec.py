"""Fused NCO-mix + polyphase-decimate Pallas kernel.

The XLA-composed front end materializes the mixed stream to HBM between the
NCO multiply and the decimation conv (~24 B of HBM traffic per input
sample); this kernel streams raw input HBM→VMEM once, mixes in VMEM, and
writes only the decimated output (~8.2 B/sample) — the front end is
bandwidth-bound, so that bound is the speed of light this kernel chases.

Mosaic layout strategy (TPU tiles are (8 sublanes, 128 lanes); arbitrary
reshapes/unaligned slices are not lowerable):

  * the raw stream keeps its natural layout, viewed host-side as rows of
    ``lane`` consecutive samples (lane = 128 when the decimation divides
    128; lane = D when D is a multiple of 128 — still 128-aligned, still
    a free reshape): Z[m, q] = z[lane·m + q];
  * each grid step DMAs a row-aligned window (overlapping windows via
    dynamic row offsets — BlockSpec windows cannot overlap; the window is
    rounded up to 8 rows, the Mosaic scratch-shape tile),
  * oscillator phases come from the exact uint32 DDS accumulator on a 2-D
    iota (tail samples sit before the block start; unsigned wraparound
    handles the negative offsets — see ops/nco.py),
  * decimation-by-D outputs split by residue r = n mod R (R = lane/D; for
    the wide-row form R = 1 and each row yields one output):
    y[R·n' + r] = Σ_c  Z[n'+c, :] · W4[:, R·c+r]  — ONE
    [rows, lane] × [lane, R·C] MXU matmul with a full lane-wide
    contraction, then a C-band diagonal sum per residue, where
    W4[q, R·c+r] = w[lane·c + q − D·r] places the (flipped, zero-padded)
    composed taps per residue;
  * the output block is [2R, TO4] (re residues stacked over im residues),
    satisfying the (8, 128) tiling rule; the host interleaves residues back
    to time order at the (cheap) decimated rate.

Equivalence with ops.nco.process + ops.decimator.fused_process is asserted
in tests/test_kernels.py (interpret mode on CPU, compiled on TPU).

Measured (TPU v5e, 2 MSPS plan ×32, 262144-sample blocks): 11.5 GSPS vs
8.5 GSPS for the XLA-composed mix+conv (1.36×), and 0.8 s vs 13.5 s compile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cutesdr_tpu.design.decimation_plan import DecimationPlan
from cutesdr_tpu.ops import decimator as dec_ops
from cutesdr_tpu.types import K_2PI, complex_zeros

_TWO32 = 4294967296.0
LANE = 128


def _kernel(scalars_ref,            # scalar prefetch: [base_acc, inc] uint32
            z_re_ref, z_im_ref,     # ANY: [rows, lane] raw stream views
            w4_ref,                 # VMEM [lane, R*C] residue tap matrix
            y_ref,                  # VMEM out [2R, TO4]
            *, TO4: int, R: int, C: int, halo_rows: int, lane: int = LANE):
    # VMEM scratch rows must be 8-aligned (Mosaic tiling); the extra rows
    # read zero padding and feed matmul rows that are never summed
    m_rows = -(-(TO4 + C - 1) // 8) * 8
    i = pl.program_id(0)

    def body(zr_s, zi_s, sem):
        row0 = pl.multiple_of(i * TO4, TO4)
        cp1 = pltpu.make_async_copy(z_re_ref.at[pl.ds(row0, m_rows)],
                                    zr_s, sem.at[0])
        cp2 = pltpu.make_async_copy(z_im_ref.at[pl.ds(row0, m_rows)],
                                    zi_s, sem.at[1])
        cp1.start()
        cp2.start()

        base = scalars_ref[0]
        inc = scalars_ref[1]
        # global sample of Z[m, q] is (i*TO4 + m - halo_rows)*lane + q
        m_ids = jax.lax.broadcasted_iota(jnp.uint32, (m_rows, lane), 0)
        q_ids = jax.lax.broadcasted_iota(jnp.uint32, (m_rows, lane), 1)
        offs = ((jnp.uint32(i * TO4) + m_ids - jnp.uint32(halo_rows))
                * jnp.uint32(lane) + q_ids)
        acc = base + offs * inc
        # Mosaic can't cast uint32->f32; reinterpret as int32, which maps
        # the phase to [-pi, pi) — identical modulo 2*pi
        ang = (pltpu.bitcast(acc, jnp.int32).astype(jnp.float32)
               * jnp.float32(K_2PI / _TWO32))
        osc_re = jnp.cos(ang)
        osc_im = jnp.sin(ang)

        cp1.wait()
        cp2.wait()
        zr = zr_s[:]
        zi = zi_s[:]
        mre = zr * osc_re - zi * osc_im
        mim = zr * osc_im + zi * osc_re

        w4 = w4_ref[:]
        pre = jnp.dot(mre, w4, preferred_element_type=jnp.float32)
        pim = jnp.dot(mim, w4, preferred_element_type=jnp.float32)

        for r in range(R):           # y[R n' + r] = sum_c P[n' + c, R c + r]
            acc_re = jnp.zeros((TO4,), jnp.float32)
            acc_im = jnp.zeros((TO4,), jnp.float32)
            for c in range(C):
                acc_re = acc_re + pre[c:c + TO4, R * c + r]
                acc_im = acc_im + pim[c:c + TO4, R * c + r]
            y_ref[r, :] = acc_re
            y_ref[R + r, :] = acc_im

    pl.run_scoped(
        body,
        pltpu.VMEM((m_rows, lane), jnp.float32),
        pltpu.VMEM((m_rows, lane), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


class MixDecParams(NamedTuple):
    w4: jax.Array            # [128, R*C] residue-decomposed taps
    phase_inc: jax.Array     # uint32


class MixDecCarry(NamedTuple):
    raw_tail: jax.Array      # [halo_rows*128] raw complex input history
    phase_base: jax.Array    # uint32 phase at block start


class MixDecimate:
    """Streaming wrapper equivalent to nco.process + decimator.fused_process
    (the carried history is *raw* input; back-dated oscillator phases come
    from uint32 wraparound).

    Supported decimations: D dividing 128 (lane rows hold 128/D outputs,
    residue-decomposed — the original form) and D a multiple of 128 (the
    20 MSPS-class plans: the stream is viewed as rows of ``lane = D``
    samples — still 128-aligned — so each row yields exactly one output,
    R = 1, same diagonal-band matmul)."""

    def __init__(self, plan: DecimationPlan, tune_freq: float,
                 tile_out: int = 512, interpret: bool = False):
        from cutesdr_tpu.ops import nco as nco_ops

        self.plan = plan
        D = self.D = plan.decimation
        if LANE % D == 0:
            self.lane = LANE
            self.R = LANE // D
        elif D % LANE == 0:
            self.lane = D                    # G = D/128 lane tiles per row
            self.R = 1
        else:
            raise ValueError(f"decimation {D} must divide or be a "
                             f"multiple of {LANE}")
        lane = self.lane
        h = np.asarray(plan.composed_taps())[::-1]       # flipped (corr form)
        d = dec_ops.total_offset(plan)
        L = len(h)
        # raw history needed: L-1-d samples, rounded up to whole lane rows
        self.halo_rows = int(np.ceil((L - 1 - d) / lane))
        halo = self.halo_rows * lane
        shift = halo - (L - 1 - d)
        # padded window taps: y[n] = sum_j w_pad[j] z[n*D + j] over
        # z = [tail(halo), x]
        w_len = shift + L
        w_pad = np.zeros(w_len)
        w_pad[shift:shift + L] = h
        # residue decomposition: output n = R*n' + r looks at samples
        # n*D + j = n'*lane + (r*D + j); with q = (r*D + j) mod lane and
        # c = (r*D + j) // lane:  W4[q, R*c + r] = w_pad[lane*c + q - r*D]
        self.C = int(np.ceil((w_len + (self.R - 1) * D) / lane))
        w4 = np.zeros((lane, self.R * self.C))
        for r in range(self.R):
            for c in range(self.C):
                q0 = r * D - lane * c    # j = lane*c + q - rD >= 0 <=> q >= q0
                lo = max(0, q0)
                hi = min(lane, q0 + w_len)
                if lo < hi:
                    w4[lo:hi, self.R * c + r] = w_pad[lo - q0:hi - q0]
        self.w4 = w4
        if tile_out % self.R:
            raise ValueError(f"tile_out must be a multiple of {self.R}")
        self.TO = tile_out                   # output samples per tile
        self.TO4 = tile_out // self.R        # output columns per residue row
        self.interpret = interpret
        self._nco = nco_ops
        self.params = MixDecParams(
            w4=jnp.asarray(w4, jnp.float32),
            phase_inc=jnp.asarray(
                nco_ops.phase_increment(tune_freq, plan.in_rate)))

    @property
    def halo(self) -> int:
        return self.halo_rows * self.lane

    def init_carry(self) -> MixDecCarry:
        return MixDecCarry(
            raw_tail=complex_zeros(self.halo, jnp.complex64),
            phase_base=jnp.zeros((), jnp.uint32))

    def retune(self, tune_freq: float) -> None:
        self.params = self.params._replace(
            phase_inc=jnp.asarray(
                self._nco.phase_increment(tune_freq, self.plan.in_rate)))

    def __call__(self, params: MixDecParams, carry: MixDecCarry,
                 x: jax.Array) -> tuple[MixDecCarry, jax.Array]:
        n = x.shape[-1]
        TO4, R, C, lane = self.TO4, self.R, self.C, self.lane
        samples_per_tile = TO4 * lane
        if n % samples_per_tile:
            raise ValueError(f"block {n} not a multiple of {samples_per_tile}")
        n_tiles = n // samples_per_tile
        z = jnp.concatenate([carry.raw_tail, x])
        new_tail = z[z.shape[-1] - self.halo:]
        # pad right so the last tile's 8-aligned window exists
        m_rows = TO4 + C - 1
        pad_rows = (C - 1) + (-(-m_rows // 8) * 8 - m_rows)
        zp = jnp.concatenate([z, jnp.zeros(pad_rows * lane, z.dtype)])
        scalars = jnp.stack([carry.phase_base, params.phase_inc])
        rows = zp.shape[-1] // lane
        z_re = zp.real.reshape(rows, lane)
        z_im = zp.imag.reshape(rows, lane)

        kernel = functools.partial(_kernel, TO4=TO4, R=R, C=C,
                                   halo_rows=self.halo_rows, lane=lane)
        y4 = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((2 * R, TO4), lambda i, s: (0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct((2 * R, n_tiles * TO4),
                                           jnp.float32),
            interpret=self.interpret,
        )(scalars, z_re, z_im, params.w4)

        # interleave residues back to time order: y[R n' + r] = y4[r, n']
        y_re = y4[:R].T.reshape(-1)
        y_im = y4[R:].T.reshape(-1)
        y = jax.lax.complex(y_re, y_im)
        new_carry = MixDecCarry(
            raw_tail=new_tail,
            phase_base=carry.phase_base + jnp.uint32(n) * params.phase_inc)
        return new_carry, y
