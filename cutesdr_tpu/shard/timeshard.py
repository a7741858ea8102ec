"""Time-axis sharding of one wideband stream over a device mesh.

One superblock of D·S input samples is split so device i owns samples
[i·S, (i+1)·S).  The wideband front-end (NCO → fused decimator → overlap-save
channel filter) carries only bounded history, so sharding is *exact*:

  * NCO: closed-form — device i adds i·S·phase_inc to the uint32 phase
    accumulator; no serial dependency at all.
  * decimator: each device needs the last len(H_eq)-1-d *input* samples of
    its left neighbor — one ring ppermute of a ~3k-sample halo over ICI.
  * channel filter: each device needs the last NFIR-1 (=1024) *decimated*
    samples of its left neighbor — a second, smaller ring ppermute.
  * device 0's halos come from the previous superblock (replicated carries);
    the value it receives on the ring (from device D-1) is exactly next
    superblock's halo, recovered replicated via a masked psum.

The audio-rate tail (S-meter/AGC/demod/resampler — inherently sequential
scans, ≤48 kSPS) runs replicated on the all_gathered filtered samples; its
cost is negligible next to the front-end, which is what gives near-linear
weak scaling.  Exactness vs. the single-chip receiver is asserted in
tests/test_shard.py on a CPU mesh.

This is the SDR analogue of sequence parallelism with neighbor exchange —
like ring attention's halo pattern but lossless, because every operator has
finite memory (SURVEY.md section 5, long-context analogy).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map   # jax >= 0.7 style

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: outputs are replicated by construction
        # (all_gather over the axis / masked psum) but the static
        # varying-mesh-axes inference can't prove it
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _old_shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _old_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from cutesdr_tpu.ops import fastfir, noiseblanker
from cutesdr_tpu.ops.util import complex_strided_corr
from cutesdr_tpu.pipeline import receiver as rx
from cutesdr_tpu.types import K_2PI

_TWO32 = 4294967296.0


class TimeShardCarry(NamedTuple):
    """Replicated carries of the sharded front-end (device-0 halos)."""
    nco_base: jax.Array     # uint32 phase accumulator at superblock start
    in_tail: jax.Array      # [len(H_eq)-1-d] mixed-sample halo for device 0
    dec_tail: jax.Array     # [NFIR-1] decimated-sample halo for device 0
    nb_tail: Any = None     # raw-sample halo for the noise blanker (if on)


def _replicated_at_zero(i, recv, axis):
    """Extract device 0's received value as a replicated array (masked psum)."""
    zero = jnp.zeros_like(recv)
    return lax.psum(jnp.where(i == 0, recv, zero), axis)


def front_end_sharded(cfg: rx.ReceiverConfig, n_dev: int, axis: str,
                      params: rx.ReceiverParams, carry: TimeShardCarry,
                      x_local: jax.Array):
    """Per-device front end (runs inside shard_map).  x_local: [S]."""
    i = lax.axis_index(axis)
    S = x_local.shape[-1]
    ring = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    rdtype = jnp.real(x_local).dtype

    # --- noise blanker (raw-history halo; stateless given the halo) ---
    if cfg.nb_on:
        nb_cfg = noiseblanker.BlankerConfig(cfg.nb_on, cfg.nb_threshold,
                                            cfg.nb_width_us, cfg.input_rate)
        h_nb = carry.nb_tail.shape[-1]
        tail_nb = x_local[..., S - h_nb:]
        recv_nb = lax.ppermute(tail_nb, axis, ring)
        halo_nb = jnp.where(i == 0, carry.nb_tail, recv_nb)
        x_local = noiseblanker.process_with_history(
            nb_cfg, jnp.concatenate([halo_nb, x_local], axis=-1), S)
        new_nb_tail = _replicated_at_zero(i, recv_nb, axis)
    else:
        new_nb_tail = carry.nb_tail

    x_local = x_local - params.dc_offset

    # --- NCO: exact global phase from the shard index ---
    k = lax.iota(jnp.uint32, S)
    acc = (carry.nco_base
           + (i.astype(jnp.uint32) * jnp.uint32(S) + k) * params.nco.phase_inc)
    ang = acc.astype(rdtype) * jnp.asarray(K_2PI / _TWO32, rdtype)
    mixed = x_local * lax.complex(jnp.cos(ang), jnp.sin(ang))

    # --- decimator halo exchange (input rate) ---
    h_in = carry.in_tail.shape[-1]
    tail = mixed[..., S - h_in:]
    recv = lax.ppermute(tail, axis, ring)
    halo = jnp.where(i == 0, carry.in_tail, recv)
    z = jnp.concatenate([halo, mixed], axis=-1)
    y_dec = complex_strided_corr(z, params.dec.h_eq[::-1],
                                 stride=cfg.plan.decimation)
    new_in_tail = _replicated_at_zero(i, recv, axis)

    # --- channel-filter halo exchange (decimated rate) ---
    nd = y_dec.shape[-1]
    ntaps = carry.dec_tail.shape[-1] + 1
    dtail = y_dec[..., nd - (ntaps - 1):]
    recv2 = lax.ppermute(dtail, axis, ring)
    halo2 = jnp.where(i == 0, carry.dec_tail, recv2)
    z2 = jnp.concatenate([halo2, y_dec], axis=-1)
    y_filt = fastfir.filter_frames(params.chan_filter.h_freq, z2, ntaps)
    new_dec_tail = _replicated_at_zero(i, recv2, axis)

    # --- gather the (audio-rate) filtered stream to every device ---
    y_all = lax.all_gather(y_filt, axis, tiled=True)
    return y_all, new_in_tail, new_dec_tail, new_nb_tail


@dataclass
class ShardedReceiver:
    """Receiver running one stream time-sharded over mesh axis 't'.

    Per-step input: superblock of n_dev·cfg.block_size complex samples.
    Output matches the single-chip Receiver exactly (same audio, same
    meters) — see tests/test_shard.py.
    """
    cfg: rx.ReceiverConfig
    mesh: Mesh
    axis: str = "t"
    rdtype: Any = jnp.float32

    def __post_init__(self):
        if self.cfg.decimator_impl != "fused":
            raise ValueError("sharded receiver requires the fused decimator")
        self.n_dev = self.mesh.shape[self.axis]
        self.params, state = rx.init(self.cfg, self.rdtype)
        self.state = state
        if self.cfg.nb_on:
            nb_cfg = noiseblanker.BlankerConfig(
                self.cfg.nb_on, self.cfg.nb_threshold, self.cfg.nb_width_us,
                self.cfg.input_rate)
            nb_tail = jnp.zeros(noiseblanker.history_len(nb_cfg),
                                state.dec.tail.dtype)
        else:
            nb_tail = jnp.zeros((0,), state.dec.tail.dtype)
        self.ts_carry = TimeShardCarry(
            nco_base=state.nco.phase_acc,
            in_tail=state.dec.tail,
            dec_tail=state.chan_filter.tail,
            nb_tail=nb_tail)
        cfg, n_dev, axis, mesh = self.cfg, self.n_dev, self.axis, self.mesh

        def step(params, state, ts_carry, x):
            front = shard_map(
                lambda p, c, xs: front_end_sharded(cfg, n_dev, axis, p, c, xs),
                mesh,
                in_specs=(P(), P(), P(axis)),
                out_specs=(P(), P(), P(), P()))
            y_all, in_tail, dec_tail, nb_tail = front(params, ts_carry, x)
            sm_c, agc_c, dm_c, rs_c, out = rx.back_end(cfg, params, state,
                                                       y_all)
            inc = params.nco.phase_inc
            new_ts = TimeShardCarry(
                nco_base=ts_carry.nco_base
                + jnp.uint32(n_dev * cfg.block_size) * inc,
                in_tail=in_tail, dec_tail=dec_tail, nb_tail=nb_tail)
            new_state = state._replace(smeter=sm_c, agc=agc_c, demod=dm_c,
                                       resamp=rs_c)
            return new_state, new_ts, out

        self._step = jax.jit(step)
        self._x_sharding = NamedSharding(mesh, P(self.axis))

    @property
    def superblock_size(self) -> int:
        return self.n_dev * self.cfg.block_size

    def process(self, iq) -> rx.StepOutput:
        """Run one superblock.  ``iq`` is either host data (single process —
        device_put shards it over the mesh) or an already globally-sharded
        jax.Array built per-host via :meth:`host_stream` (multi-process,
        where no single host holds the full superblock)."""
        if not (isinstance(iq, jax.Array)
                and iq.sharding.is_equivalent_to(self._x_sharding, iq.ndim)):
            iq = jax.device_put(iq, self._x_sharding)
        self.state, self.ts_carry, out = self._step(
            self.params, self.state, self.ts_carry, iq)
        return out

    def host_stream(self):
        """Per-host ingest assembler: each process contributes only the time
        slices its local devices own (shard/multihost.py), so a multi-host
        run never gathers the raw stream to one host."""
        from cutesdr_tpu.shard.multihost import HostShardedStream
        return HostShardedStream(self.mesh, block_per_device=self.cfg.block_size)
