"""Benchmark harness: IQ megasamples/s/chip through the full receiver chain.

Prints ONE JSON line:
  {"metric": "iq_msps_per_chip", "value": N, "unit": "Msamples/s", "vs_baseline": N}

Baseline: the reference sustains a 2 MSPS complex stream in real time on one
~3 GHz x86 core (BASELINE.md); vs_baseline = measured_Msps / 2.0.

The benchmark streams synthetic IQ through the flagship config (2 MSPS USB:
NCO → fused decimate ×32 → 2048-pt overlap-save bandpass → S-meter → AGC →
SSB demod → 48 kHz resample), state donated between steps, input resident on
device (host→device transfer for 2 MSPS c64 is 16 MB/s — negligible vs ICI/
PCIe, and double-buffered in production).  Details go to stderr.
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


def bench_receiver(frames_per_block=16, n_iters=100, warmup=3):
    import jax
    import jax.numpy as jnp

    from cutesdr_tpu.pipeline import receiver as rx

    cfg = rx.ReceiverConfig(input_rate=2_000_000.0, mode="usb",
                            tune_freq=100_000.0, audio_rate=48000.0,
                            frames_per_block=frames_per_block)
    params, state = rx.init(cfg)

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

    t0 = time.perf_counter()
    for _ in range(warmup):
        state, out = step(params, state, re, im)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    print(f"compile+warmup: {t1 - t0:.1f}s  block={cfg.block_size}",
          file=sys.stderr)

    # best of 3 timed repetitions: the remote-tunnel dispatch path has
    # large run-to-run spread (the bench_suite convention, CLAUDE.md)
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, out = step(params, state, re, im)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
        print(f"rep {rep}: {n_iters} x {cfg.block_size} samples in "
              f"{dt:.3f}s -> {n_iters * cfg.block_size / dt / 1e6:.1f} Msps",
              file=sys.stderr)

    samples = n_iters * cfg.block_size
    msps = samples / best / 1e6
    print(f"receiver best-of-3: {msps:.1f} Msps", file=sys.stderr)
    return msps


def main():
    msps = None
    err = None
    for attempt in range(3):
        try:
            import jax
            _enable_compile_cache()
            print(f"device: {jax.devices()[0]}", file=sys.stderr)
            msps = bench_receiver()
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
    }))


if __name__ == "__main__":
    main()
