"""Extended benchmark suite: the five BASELINE.json configurations.

  1. AM chain at 2 MSPS (testbench carrier -> downconvert+filter+AM demod)
  2. SSB chain at 2 MSPS (decimate, complex bandpass, SSB + AGC)
  3. FM with noise blanker + resampler to 48 kHz
  4. 64-channel SSB/AM bank from one 10 MSPS stream
  5. full receiver at 20 MSPS with 4096-pt spectrum FFT + S-meter

Each prints a JSON line to stdout and writes BENCH_DETAILS.json; bench.py
remains the driver's single-line entry point.

Usage:  python -m cutesdr_tpu.bench_suite [--iters N] [--only k]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


REPS = 3   # timings through the remote tunnel vary run to run; take the
           # median of REPS positive slope measurements (the tunnel is
           # nonstationary; a negative slope is discarded and retried)


def _fence(out):
    """Force device completion via a scalar D2H readback.

    jax.block_until_ready is NOT a fence through the axon tunnel — it
    returns on dispatch ACK, which is how every pre-r4 bench row in this
    file overstated throughput by 2-3 orders of magnitude (see
    bench_stages module docstring for the validation)."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.real(jnp.sum(leaf)))


def _timeit(step, args, n_iters):
    """Seconds/step as the slope between two fenced chained lengths
    (removes the ~25-40 ms fixed D2H latency).  Returns (median of REPS
    positive samples, spread fraction over the kept samples)."""
    out = step(*args)
    _fence(out[1:])
    state = out[0]
    k1, k2 = 2, max(4, n_iters)

    def run(k):
        s = state
        t0 = time.perf_counter()
        for _ in range(k):
            o = step(args[0], s, *args[2:])
            s = o[0]
        _fence(o[1:])
        return time.perf_counter() - t0

    samples = []
    for _ in range(3 * REPS):          # retry budget: the tunnel can be
        ts = {k: run(k) for k in (k1, k2)}   # nonstationary enough that a
        s = (ts[k2] - ts[k1]) / (k2 - k1)    # slope comes out <= 0 (r5:
        if s > 0:                            # one full-suite run published
            samples.append(s)                # a NEGATIVE latency row via
        if len(samples) >= REPS:             # the old best-of-min)
            break
    if not samples:
        raise RuntimeError("slope fence returned no positive samples "
                           "(tunnel nonstationary) — rerun this row")
    samples.sort()
    med = samples[len(samples) // 2]
    return med, (samples[-1] - samples[0]) / med


def bench_receiver_cfg(name, cfg, n_iters, extras=None, stimulus=None):
    """One chain row.  ``stimulus``: optional complex ndarray of
    cfg.block_size samples (default: white noise — the WORST case for the
    PLL modes, whose unlocked blocks take the exact sequential-scan
    fallback; pass a real modulated signal to bench the locked path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutesdr_tpu.pipeline import receiver as rx

    params, state = rx.init(cfg)
    # production ingest contract: f32 planes in, complex formed on device
    # (complex64 host<->device transfers wedge the axon tunnel — CLAUDE.md)
    step = jax.jit(lambda p, s, re, im: rx.receiver_step(
        cfg, p, s, jax.lax.complex(re, im)))
    if stimulus is None:
        rng = np.random.default_rng(3)
        stimulus = (rng.standard_normal(cfg.block_size)
                    + 1j * rng.standard_normal(cfg.block_size)) * 300
    re = jax.device_put(jnp.asarray(np.real(stimulus).astype(np.float32)))
    im = jax.device_put(jnp.asarray(np.imag(stimulus).astype(np.float32)))
    per_step, spread = _timeit(step, (params, state, re, im), n_iters)
    msps = cfg.block_size / per_step / 1e6
    return {"config": name, "input_rate": cfg.input_rate, "mode": cfg.mode,
            "block": cfg.block_size, "ms_per_step": round(per_step * 1e3, 3),
            "iq_msps": round(msps, 1),
            "realtime_factor": round(msps * 1e6 / cfg.input_rate, 1),
            "spread": round(spread, 2),
            **(extras or {})}


def bench_channel_bank(n_iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutesdr_tpu.pipeline.receiver import ReceiverConfig
    from cutesdr_tpu.shard import ChannelBank

    cfg = ReceiverConfig(input_rate=10_000_000.0, mode="usb",
                         audio_rate=48000.0)
    freqs = [(-4.5e6 + 140_000.0 * i) for i in range(64)]
    bank = ChannelBank(cfg, freqs)
    rng = np.random.default_rng(4)
    re = jax.device_put(jnp.asarray(
        (rng.standard_normal(cfg.block_size) * 300).astype(np.float32)))
    im = jax.device_put(jnp.asarray(
        (rng.standard_normal(cfg.block_size) * 300).astype(np.float32)))

    state, out = bank._step_planes(bank.params, bank.state, re, im)
    _fence(out.smeter_ave_db)
    k1, k2 = 2, max(4, n_iters)

    def run(k):
        s = state
        t0 = time.perf_counter()
        for _ in range(k):
            s, o = bank._step_planes(bank.params, s, re, im)
        _fence(o.smeter_ave_db)
        return time.perf_counter() - t0

    samples = []
    for _ in range(3 * REPS):   # same nonstationarity guard as _timeit
        ts = {k: run(k) for k in (k1, k2)}
        s = (ts[k2] - ts[k1]) / (k2 - k1)
        if s > 0:
            samples.append(s)
        if len(samples) >= REPS:
            break
    samples.sort()
    per_step = samples[len(samples) // 2]
    msps = cfg.block_size / per_step / 1e6
    return {"config": "64ch_bank_10msps", "channels": 64,
            "input_rate": cfg.input_rate, "block": cfg.block_size,
            "ms_per_step": round(per_step * 1e3, 3),
            "iq_msps": round(msps, 1),
            "channel_msps": round(msps * 64, 1),
            "realtime_factor": round(msps * 1e6 / cfg.input_rate, 1),
            "spread": round((samples[-1] - samples[0]) / per_step, 2)}


def _bench_fm_locked(n_iters):
    """FM row with a LOCKED stimulus (voice-like FM at the tune freq):
    the PLL runs the parallel linear solve, which is what a real FM
    station exercises — the noise-input row is the acquisition-grade
    worst case."""
    import numpy as np

    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    cfg = ReceiverConfig(input_rate=2e6, mode="fm", nb_on=True,
                         audio_rate=48000.0, frames_per_block=16)
    t = np.arange(cfg.block_size) / cfg.input_rate
    beta = 3000.0 / 700.0
    x = 8000.0 * np.exp(1j * (2 * np.pi * 0.0 * t
                              + beta * np.sin(2 * np.pi * 700.0 * t)))
    return bench_receiver_cfg("fm_locked_2msps", cfg, n_iters,
                              stimulus=x.astype(np.complex64))


def _bench_sam_noise(n_iters):
    """SAM on carrier-less noise — the sequential worst case.  The 100 Hz
    loop cannot take a chunked guess-verify tier (bitwise sync measured
    non-live: 4.6k/16k/never within 20k samples across seeds), so every
    block runs the exact scan — since r5 as the scalar-core loop kernel
    (kernels/seqloop) instead of the ~2.8 us/iteration XLA scan.  This
    row exists so BENCH_DETAILS shows the worst case's honest cost
    (VERDICT r4 #4b)."""
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    cfg = ReceiverConfig(input_rate=2e6, mode="sam", audio_rate=None,
                         frames_per_block=16)
    return bench_receiver_cfg(
        "sam_noise_2msps", cfg, n_iters,
        extras={"note": "carrier-less noise = every block takes the exact "
                        "sequential tier, now the scalar-core seqloop "
                        "kernel (no chunked tier: bitwise re-sync is not "
                        "live for the 100 Hz loop); see the sam row of "
                        "refgold for the locked path's quality"})


def _bench_agc_hang(n_iters):
    """Hang-mode AGC on a keyed (on/off) carrier — the envelope class r4
    suspected would force the sequential averager fallback.  Measured r5:
    the guess-verify hang solve validates every block (0 fallbacks across
    envelope classes, tests/test_ops.py::test_agc_hang_parallel_is_
    steady_state), so this row should sit within ~10% of the non-hang ssb
    row — documenting that the parallel solve IS the steady state."""
    import numpy as np

    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    cfg = ReceiverConfig(input_rate=2e6, mode="usb", audio_rate=None,
                         agc_hang=True, frames_per_block=16)
    t = np.arange(cfg.block_size) / cfg.input_rate
    keyed = np.where((np.arange(cfg.block_size) // 40000) % 2 == 0,
                     8000.0, 80.0)
    x = keyed * np.exp(1j * 2 * np.pi * (cfg.input_rate / 20.0 + 1000.0) * t)
    return bench_receiver_cfg(
        "agc_hang_keyed_2msps", cfg, n_iters,
        stimulus=x.astype(np.complex64),
        extras={"note": "hang-mode AGC, hard on/off keyed carrier; the "
                        "parallel hang solve validates every block (r5 "
                        "measurement) so this matches the non-hang "
                        "ssb_2msps row instead of paying the scan"})


def bench_latency_mode(n_iters):
    """The exact config the CLI latency chooser produces for
    --target-latency-ms 10 at 2 MSPS (cli.py run/serve default), chained
    state — the measured number behind the README's latency claim
    (VERDICT r3 item 5).

    Caveat stated in the row: per-step wall time through this remote
    tunnel includes a ~0.08-0.1 ms dispatch floor that a locally-attached
    chip does not pay; the block budget (block/fs) is what real time
    requires."""
    from cutesdr_tpu.design.latency import choose_fastfir_sizes, latency_report
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    base = ReceiverConfig(input_rate=2e6, mode="usb", audio_rate=48000.0)
    cfg = choose_fastfir_sizes(base, 10e-3)
    rep = latency_report(cfg)
    row = bench_receiver_cfg("latency10ms_2msps", cfg, n_iters)
    budget_ms = cfg.block_size / cfg.input_rate * 1e3
    row.update({
        "fastfir_nfft": cfg.fastfir_nfft,
        "fastfir_ntaps": cfg.fastfir_ntaps,
        "pipeline_latency_ms": round(rep["total"] * 1e3, 2),
        "budget_ms_per_block": round(budget_ms, 3),
        "realtime": bool(row["ms_per_step"] < budget_ms),
        "note": ("chosen by design/latency.choose_fastfir_sizes for a "
                 "10 ms target; real time needs ms_per_step <= "
                 f"{budget_ms:.3f} ms; tunnel dispatch floor ~0.08-0.1 ms "
                 "inflates small-step wall time on this rig"),
    })
    return row


def _session_breakdown(cfg):
    """Measure the session loop's component costs one at a time so the
    limiting term is *documented* rather than blamed (VERDICT r2 item 1):

      h2d_sustained_ms — framework-independent transport floor: device_put
                         of one block's int16 wire planes + a trivial
                         on-device touch fetched to host, chained, so the
                         upload must REALLY complete each iteration (the
                         naive block_until_ready(device_put(...)) timing
                         reads ~0.5 ms through this tunnel — an async
                         illusion; the sustained number is the honest one)
      step_ms          — device step on resident planes, state chained
      d2h_ms           — audio block fetch (staged async copy)
      host_ms          — host-side per-block work (plane re-block copy +
                         throttled display-FFT feed), no device involved

    Real time at 20 MSPS needs block/fs per block (13.1 ms for 262144).
    If ms_per_block ~= h2d_sustained_ms + step_ms, the session adds no
    overhead beyond the transport floor and the wire is the only
    remaining term."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutesdr_tpu.pipeline.receiver import Receiver
    from cutesdr_tpu.pipeline.spectrum import SpectrumAnalyzer, SpectrumConfig

    rx = Receiver(cfg)
    rng = np.random.default_rng(5)
    re = (rng.standard_normal(cfg.block_size) * 300).astype(np.int16)
    im = (rng.standard_normal(cfg.block_size) * 300).astype(np.int16)

    def best_of(f, reps=8):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            vals.append(time.perf_counter() - t0)
        return min(vals) * 1e3

    # transport floor: upload + forced completion (framework-independent)
    touch = jax.jit(lambda a, b: a.astype(jnp.int32).sum()
                    + b.astype(jnp.int32).sum())
    float(touch(jax.device_put(re), jax.device_put(im)))      # warm/compile
    h2d_sustained_ms = best_of(
        lambda: float(touch(jax.device_put(re), jax.device_put(im))))

    # device step on resident planes — slope between two chained lengths,
    # each fenced by a scalar D2H (block_until_ready is an ack, not a
    # fence, through this tunnel — see _fence)
    re_d, im_d = jax.device_put(re), jax.device_put(im)
    out = rx.process_planes(re_d, im_d)               # compile
    _fence(out.audio)

    def chain(k):
        for _ in range(k):
            o = rx.process_planes(re_d, im_d)
        _fence(o.audio)
    t2 = best_of(lambda: chain(2))
    t16 = best_of(lambda: chain(16))
    step_ms = max(t16 - t2, 0.0) / 14.0

    # D2H: materialize the audio block after an async staged copy
    out = rx.process_planes(re_d, im_d)
    out.audio.copy_to_host_async()

    def d2h():
        np.asarray(out.audio)
    d2h_ms = best_of(d2h)

    # host-only per-block work (the pump_planes path minus the device)
    an = SpectrumAnalyzer(SpectrumConfig(fft_size=4096, ave_size=4,
                                         sample_rate=cfg.input_rate))
    an.feed_planes(re[:4096], im[:4096])      # warm the accumulate program

    def host():
        rb = np.concatenate([re[:0], re])     # the re-block copy
        ib = np.concatenate([im[:0], im])
        an.feed_planes(rb, ib)
    host_ms = best_of(host)

    return {"h2d_sustained_ms": round(h2d_sustained_ms, 3),
            "step_ms": round(step_ms, 3),
            "d2h_ms": round(d2h_ms, 3),
            "host_ms": round(host_ms, 3)}


def bench_session_streaming(n_blocks, depth, breakdown=None):
    """Steady-state SESSION throughput at 20 MSPS through the production
    path: int16 wire planes, threaded double-buffered H2D, device step,
    audio D2H + rate-locked queue, throttled spectrum accumulation — the
    whole host↔device loop, not a tight device loop.  pipeline_depth
    overlaps upload of block k+1 with compute of block k."""
    import numpy as np

    from cutesdr_tpu.pipeline.receiver import ReceiverConfig
    from cutesdr_tpu.session import ReceiverSession

    cfg = ReceiverConfig(input_rate=20_000_000.0, mode="usb",
                         audio_rate=48000.0)
    sess = ReceiverSession(cfg, pipeline_depth=depth)
    sess.start()
    rng = np.random.default_rng(5)
    feed = [((rng.standard_normal(cfg.block_size) * 300).astype(np.int16),
             (rng.standard_normal(cfg.block_size) * 300).astype(np.int16))
            for _ in range(4)]
    sess.pump_planes(*feed[0])       # compile + warm
    sess.flush()

    samples = []
    for _ in range(REPS):
        # drain the audio queue so overflow handling doesn't enter the loop
        if sess.audio_queue.level > 0:
            sess.audio_queue.get(sess.audio_queue.level)
        t0 = time.perf_counter()
        for i in range(n_blocks):
            sess.pump_planes(*feed[i % len(feed)])
        sess.flush()
        samples.append((time.perf_counter() - t0) / n_blocks)
    per_block = min(samples)
    msps = cfg.block_size / per_block / 1e6
    budget_ms = cfg.block_size / cfg.input_rate * 1e3
    row = {"config": f"session_20msps_depth{depth}", "depth": depth,
           "input_rate": cfg.input_rate, "block": cfg.block_size,
           "wire": "int16-planes",
           "ms_per_block": round(per_block * 1e3, 3),
           "budget_ms_per_block": round(budget_ms, 1),
           "iq_msps": round(msps, 1),
           "realtime_factor": round(msps * 1e6 / cfg.input_rate, 1),
           "spread": round((max(samples) - per_block) / per_block, 2)}
    if breakdown:
        row["breakdown"] = breakdown
        acct = (breakdown["h2d_sustained_ms"] + breakdown["step_ms"]
                + breakdown["d2h_ms"] + breakdown["host_ms"])
        row["breakdown_sum_ms"] = round(acct, 3)
        wire_mb = cfg.block_size * 2 * 2 / 1e6
        row["tunnel_mbps"] = round(
            wire_mb / breakdown["h2d_sustained_ms"] * 1e3, 1)
        row["note"] = (
            f"real time needs ms_per_block <= {budget_ms:.1f}; "
            "h2d_sustained_ms is the framework-independent transport floor "
            f"for this block's {wire_mb:.1f} MB of int16 wire planes "
            "(device_put + forced completion, chained).  ms_per_block ~= "
            "h2d_sustained_ms: the session adds no overhead beyond that "
            "floor, so the transport is the only remaining term — 20 MSPS "
            "needs 40 MB/s sustained H2D (int16), this rig's remote "
            "tunnel carries ~15-25 MB/s (tunnel_mbps).  Device compute is "
            "not the limit (full_20msps device-loop row: >100x real time; "
            "step_ms here still includes per-dispatch tunnel RPC and is "
            "an upper bound).  On directly-attached PCIe (>=8 GB/s) the "
            "same upload is ~0.13 ms/block against the 13.1 ms budget")
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", type=int, default=0, help="run one config 1-12")
    args = ap.parse_args(argv)

    import os

    import jax
    cache_dir = os.path.join(os.getcwd(), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    results = []
    # chain rows use frames_per_block=16 (a ~0.26 s throughput block):
    # at the latency-mode frames_per_block=1 the per-step device time is
    # overhead-dominated and the slope fence mostly measures fixed costs —
    # row 9 covers that regime explicitly
    runs = {
        1: lambda: bench_receiver_cfg(
            "am_2msps", ReceiverConfig(input_rate=2e6, mode="am",
                                       audio_rate=None,
                                       frames_per_block=16), args.iters),
        2: lambda: bench_receiver_cfg(
            "ssb_2msps", ReceiverConfig(input_rate=2e6, mode="usb",
                                        audio_rate=None,
                                        frames_per_block=16), args.iters),
        3: lambda: bench_receiver_cfg(
            "fm_nb_resamp_2msps", ReceiverConfig(input_rate=2e6, mode="fm",
                                                 nb_on=True,
                                                 audio_rate=48000.0,
                                                 frames_per_block=16),
            args.iters,
            extras={"note": "white-noise input = unlocked-PLL worst case; "
                            "every block takes the chunked guess-verify "
                            "scan tier (demod/fm._pll_chunked — bitwise-"
                            "exact, 14x the r4 sequential fallback); see "
                            "fm_locked_2msps for the locked linear path"}),
        10: lambda: _bench_fm_locked(args.iters),
        11: lambda: _bench_sam_noise(args.iters),
        12: lambda: _bench_agc_hang(args.iters),
        4: lambda: bench_channel_bank(args.iters),
        5: lambda: bench_receiver_cfg(
            "full_20msps", ReceiverConfig(input_rate=20_000_000.0,
                                          mode="usb", audio_rate=48000.0,
                                          frames_per_block=16),
            args.iters),
        6: lambda: bench_session_streaming(max(8, args.iters), depth=1,
                                           breakdown=_bd()),
        7: lambda: bench_session_streaming(max(8, args.iters), depth=2,
                                           breakdown=_bd()),
        8: lambda: bench_session_streaming(max(8, args.iters), depth=4,
                                           breakdown=_bd()),
        9: lambda: bench_latency_mode(args.iters),
    }

    _bd_cache = {}

    def _bd():
        if "v" not in _bd_cache:
            _bd_cache["v"] = _session_breakdown(
                ReceiverConfig(input_rate=20_000_000.0, mode="usb",
                               audio_rate=48000.0))
        return _bd_cache["v"]
    for k in sorted(runs):
        if args.only and k != args.only:
            continue
        try:
            r = runs[k]()
        except Exception as e:   # keep going; report the failure
            r = {"config": f"#{k}", "error": repr(e)[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)

    details_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    if args.only:
        # partial run: merge into the existing file instead of clobbering it
        try:
            with open(details_path) as f:
                existing = {r.get("config"): r for r in json.load(f)}
        except (OSError, ValueError):
            existing = {}
        for r in results:
            existing[r.get("config")] = r
        results = list(existing.values())
    with open(details_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote BENCH_DETAILS.json ({len(results)} configs)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
