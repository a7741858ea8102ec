"""Benchmark harness: IQ megasamples/s/chip through the full receiver chain.

Prints ONE JSON line:
  {"metric": "iq_msps_per_chip", "value": N, "unit": "Msamples/s", "vs_baseline": N}

Baseline: the reference sustains a 2 MSPS complex stream in real time on one
~3 GHz x86 core (BASELINE.md); vs_baseline = measured_Msps / 2.0.

The benchmark streams synthetic IQ through the flagship config (2 MSPS USB:
Pallas fused mix+decimate ×32 → Pallas four-step 2048-pt overlap-save
bandpass → parallel S-meter/AGC → SSB demod → rational-polyphase 48 kHz
resample),
state chained between steps, input resident on device.  Timing uses the
r4 D2H-slope fence (see bench_receiver docstring) — numbers before r4
were remote-tunnel artifacts.  Details go to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent compilation cache: the axon remote-compile path is slow
    (minutes per program), so cache compiled executables across runs.
    Pallas programs are made cache-stable by kernels._cachefix (Mosaic
    payloads used to embed the trace callsite — see its docstring); cache
    misses are logged to stderr so a warm run is verifiable."""
    import logging

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_explain_cache_misses", True)
    logging.getLogger("jax._src.compiler").setLevel(logging.WARNING)
    # explain_cache_misses also narrates first-trace TRACING CACHE misses
    # (partial_eval) for every lax.cond/while body — pure warmup noise
    # here; only the persistent-compile-cache misses are of interest
    logging.getLogger("jax._src.interpreters.partial_eval").setLevel(
        logging.ERROR)


def bench_receiver(frames_per_block=256, k1=4, k2=64, reps=5):
    """Honest device throughput of the production receiver step.

    Timing methodology (r4): through the axon tunnel,
    ``jax.block_until_ready`` returns on dispatch ACK — NOT device
    completion — so ack-fenced chained loops measure the RPC floor and
    report impossible numbers (pre-r4 rounds recorded 4,700-5,300 Msps
    that way; the same harness 'measured' a 4096^3 matmul at 30x the
    chip's peak FLOPs).  The only real fence is a device->host readback,
    which carries a ~25-40 ms fixed latency, so per-step time is the
    SLOPE between two chained lengths, each fenced by a scalar readback.
    Validated against known-FLOPs matmuls (~86% of v5e bf16 peak).
    """
    import jax
    import jax.numpy as jnp

    from cutesdr_tpu.pipeline import receiver as rx

    cfg = rx.ReceiverConfig(input_rate=2_000_000.0, mode="usb",
                            tune_freq=100_000.0, audio_rate=48000.0,
                            frames_per_block=frames_per_block)
    params, state = rx.init(cfg)
    print(f"impls: decimator={cfg.decimator_impl} "
          f"fastfir={cfg.fastfir_impl}", file=sys.stderr)

    @jax.jit
    def step(params, state, re, im):
        # complex formed on device: complex64 crossing the host<->device
        # boundary wedges the axon tunnel (CLAUDE.md), and the production
        # ingest path ships f32 planes for the same reason
        return rx.receiver_step(cfg, params, state, jax.lax.complex(re, im))

    rng = np.random.default_rng(7)
    re = jax.device_put(jnp.asarray(
        rng.standard_normal(cfg.block_size).astype(np.float32) * 100))
    im = jax.device_put(jnp.asarray(
        rng.standard_normal(cfg.block_size).astype(np.float32) * 100))

    def fence(out):
        return float(jnp.sum(out.audio))      # D2H readback = real fence

    t0 = time.perf_counter()
    state, out = step(params, state, re, im)
    fence(out)
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s  "
          f"block={cfg.block_size}", file=sys.stderr)

    pers = []
    for rep in range(3 * reps):      # retry budget: discard non-positive
        ts = {}                      # slopes (the tunnel is nonstationary
        for k in (k1, k2):           # enough to produce them — see
            t0 = time.perf_counter()  # bench_suite._timeit)
            s = state
            for _ in range(k):
                s, out = step(params, s, re, im)
            fence(out)
            ts[k] = time.perf_counter() - t0
        per = (ts[k2] - ts[k1]) / (k2 - k1)
        if per <= 0:
            print(f"rep {rep}: non-positive slope {per * 1e3:.3f} ms "
                  f"discarded", file=sys.stderr)
            continue
        pers.append(per)
        print(f"rep {rep}: slope {per * 1e3:.3f} ms/step -> "
              f"{cfg.block_size / per / 1e6:.1f} Msps", file=sys.stderr)
        if len(pers) >= reps:
            break
    if not pers:
        raise RuntimeError("no positive slope samples (tunnel "
                           "nonstationary) — rerun")

    # Headline = median of the per-rep slopes (r5: the tunnel jitters reps
    # by ~18%, so best-of overstates; spread + n are reported alongside).
    msps_all = sorted(cfg.block_size / p / 1e6 for p in pers)
    msps = float(np.median(msps_all))
    stats = {"n": reps, "min": round(msps_all[0], 2),
             "max": round(msps_all[-1], 2),
             "best": round(msps_all[-1], 2),
             "spread_pct": round(100.0 * (msps_all[-1] - msps_all[0])
                                 / msps, 1)}
    print(f"receiver median-of-{reps} slope: {msps:.1f} Msps "
          f"(min {stats['min']}, max {stats['max']}, "
          f"spread {stats['spread_pct']}%)", file=sys.stderr)
    return msps, stats


def main():
    msps = None
    stats = None
    err = None
    for attempt in range(3):
        try:
            import jax
            _enable_compile_cache()
            print(f"device: {jax.devices()[0]}", file=sys.stderr)
            msps, stats = bench_receiver()
            break
        except Exception as e:  # tunnel flakiness: retry, then report
            err = repr(e)[:300]
            print(f"bench attempt {attempt + 1} failed: {err}",
                  file=sys.stderr)
            time.sleep(10)
    if msps is None:
        print(json.dumps({"metric": "iq_msps_per_chip", "value": 0.0,
                          "unit": "Msamples/s", "vs_baseline": 0.0,
                          "error": err}))
        return
    print(json.dumps({
        "metric": "iq_msps_per_chip",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 2.0, 2),
        "stats": stats,
        "note": ("r5: median-of-n D2H-slope fence (best-of retained in "
                 "stats.best); r1-r3 values (4700-5343) were remote-tunnel "
                 "artifacts (block_until_ready acks the dispatch without "
                 "waiting) — the same harness honestly measured the r3 "
                 "code at 5.7 Msps"),
    }))


if __name__ == "__main__":
    main()
