"""Fused NCO-mix + polyphase-decimate Pallas kernel.

The XLA-composed front end materializes the mixed stream to HBM between the
NCO multiply and the decimation conv (~24 B of HBM traffic per input
sample); this kernel streams raw input tiles HBM→VMEM with in-kernel DMA
(overlapping windows via dynamic offsets — BlockSpec windows can't overlap)
and keeps the mixed tile in VMEM, so HBM sees the raw input once plus the
small decimated output (~8.3 B/sample) — the front end is bandwidth-bound,
so that bound is the speed of light this kernel chases.

Per grid step (one tile of TO output samples, decimation D):
  1. DMA z[i·TO·D : i·TO·D + TO·D + halo] into VMEM scratch (halo =
     composed-FIR history; the host prepends the carried *raw* tail so tile
     windows never index negatively),
  2. phases from the exact uint32 DDS accumulator; tail samples sit before
     the block start, handled by unsigned wraparound
     (acc = base + (g − halo)·inc mod 2³², see ops/nco.py),
  3. mix in VMEM (complex multiply as two f32 planes),
  4. polyphase reduction: frames F[m, p] = mixed[m·D + p] give
     y[n] = Σ_k F[n+k, :] · h_k  — one [TO+K−1, D] × [D, K] MXU matmul,
     then a K-band diagonal sum.

Equivalence with ops.nco.process + ops.decimator.fused_process is asserted
in tests/test_kernels.py (interpret mode on CPU, compiled on TPU).
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
from cutesdr_tpu.types import K_2PI

_TWO32 = 4294967296.0


def _kernel(scalars_ref,            # scalar prefetch: [base_acc, inc] uint32
            z_re_ref, z_im_ref,     # ANY/HBM: [n + halo]
            hmat_ref,               # VMEM [D, K]
            y_re_ref, y_im_ref,     # VMEM out tiles [1, TO]
            *, TO: int, D: int, K: int, halo: int):
    n_in = TO * D + halo
    i = pl.program_id(0)

    def body(zr_s, zi_s, sem):
        start = pl.multiple_of(i * (TO * D), TO * D)
        cp1 = pltpu.make_async_copy(z_re_ref.at[pl.ds(start, n_in)],
                                    zr_s.at[0], sem.at[0])
        cp2 = pltpu.make_async_copy(z_im_ref.at[pl.ds(start, n_in)],
                                    zi_s.at[0], sem.at[1])
        cp1.start()
        cp2.start()

        base = scalars_ref[0]
        inc = scalars_ref[1]
        g = jax.lax.broadcasted_iota(jnp.uint32, (1, n_in), 1)
        offs = (jnp.uint32(i) * jnp.uint32(TO * D)) + g - jnp.uint32(halo)
        acc = base + offs * inc
        ang = acc.astype(jnp.float32) * jnp.float32(K_2PI / _TWO32)
        osc_re = jnp.cos(ang)
        osc_im = jnp.sin(ang)

        cp1.wait()
        cp2.wait()
        zr = zr_s[0].reshape(1, n_in)
        zi = zi_s[0].reshape(1, n_in)
        mre = zr * osc_re - zi * osc_im
        mim = zr * osc_im + zi * osc_re

        m_rows = TO + K - 1
        fre = mre.reshape(n_in)[: m_rows * D].reshape(m_rows, D)
        fim = mim.reshape(n_in)[: m_rows * D].reshape(m_rows, D)
        h = hmat_ref[:]
        pre = jnp.dot(fre, h, preferred_element_type=jnp.float32)
        pim = jnp.dot(fim, h, preferred_element_type=jnp.float32)

        acc_re = jnp.zeros((TO,), jnp.float32)
        acc_im = jnp.zeros((TO,), jnp.float32)
        for k in range(K):   # y[n] = sum_k P[n+k, k]
            acc_re = acc_re + jax.lax.dynamic_slice(pre, (k, k), (TO, 1))[:, 0]
            acc_im = acc_im + jax.lax.dynamic_slice(pim, (k, k), (TO, 1))[:, 0]
        y_re_ref[:] = acc_re.reshape(1, TO)
        y_im_ref[:] = acc_im.reshape(1, TO)

    pl.run_scoped(
        body,
        pltpu.VMEM((1, n_in), jnp.float32),
        pltpu.VMEM((1, n_in), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


class MixDecParams(NamedTuple):
    hmat: jax.Array          # [D, K] polyphase matrix of padded flipped taps
    phase_inc: jax.Array     # uint32


class MixDecCarry(NamedTuple):
    raw_tail: jax.Array      # [halo] raw complex input history
    phase_base: jax.Array    # uint32 phase at block start


class MixDecimate:
    """Streaming wrapper equivalent to nco.process + decimator.fused_process
    (the carried history is *raw* input; back-dated oscillator phases come
    from uint32 wraparound)."""

    def __init__(self, plan: DecimationPlan, tune_freq: float,
                 tile_out: int = 512, interpret: bool = False):
        from cutesdr_tpu.ops import nco as nco_ops

        self.plan = plan
        self.D = plan.decimation
        h = np.asarray(plan.composed_taps())[::-1]       # flipped (corr form)
        d = dec_ops.total_offset(plan)
        L = len(h)
        # fused corr: y[n] = sum_{j} h[L-1-j]... over z2=[tail(L-1-d), x];
        # pad to K*D with the taps shifted so tail length halo=(K-1)*D
        self.K = int(np.ceil((L - 1 - d) / self.D)) + 1
        Lp = self.K * self.D
        self.halo = Lp - self.D
        w = np.zeros(Lp)
        shift = self.halo - (L - 1 - d)
        w[shift:shift + L] = h
        self.hmat = w.reshape(self.K, self.D).T.copy()   # [D, K]
        self.TO = tile_out
        self.interpret = interpret
        self._nco = nco_ops
        self.params = MixDecParams(
            hmat=jnp.asarray(self.hmat, jnp.float32),
            phase_inc=jnp.asarray(
                nco_ops.phase_increment(tune_freq, plan.in_rate)))

    def init_carry(self) -> MixDecCarry:
        return MixDecCarry(
            raw_tail=jnp.zeros(self.halo, jnp.complex64),
            phase_base=jnp.zeros((), jnp.uint32))

    def retune(self, tune_freq: float) -> None:
        self.params = self.params._replace(
            phase_inc=jnp.asarray(
                self._nco.phase_increment(tune_freq, self.plan.in_rate)))

    def __call__(self, params: MixDecParams, carry: MixDecCarry,
                 x: jax.Array) -> tuple[MixDecCarry, jax.Array]:
        n = x.shape[-1]
        TO, D, K, halo = self.TO, self.D, self.K, self.halo
        if n % (TO * D):
            raise ValueError(f"block {n} not a multiple of tile {TO * D}")
        n_tiles = n // (TO * D)
        z = jnp.concatenate([carry.raw_tail, x])
        scalars = jnp.stack([carry.phase_base, params.phase_inc])

        kernel = functools.partial(_kernel, TO=TO, D=D, K=K, halo=halo)
        y_re, y_im = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((1, TO), lambda i, s: (i, 0)),
                    pl.BlockSpec((1, TO), lambda i, s: (i, 0)),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, TO), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, TO), jnp.float32),
            ),
            interpret=self.interpret,
        )(scalars, z.real, z.imag, params.hmat)

        y = jax.lax.complex(y_re.reshape(-1), y_im.reshape(-1))
        new_carry = MixDecCarry(
            raw_tail=z[z.shape[-1] - halo:],
            phase_base=carry.phase_base + jnp.uint32(n) * params.phase_inc)
        return new_carry, y
