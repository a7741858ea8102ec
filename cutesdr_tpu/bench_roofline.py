"""Roofline check for the hot front-end ops: achieved HBM bandwidth vs the
chip's peak, per op, at large batch.

The front-end ops are bandwidth-bound (few FLOPs per byte), so "speed of
light" = moving their bytes at HBM rate.  Prints one JSON line per op with
bytes moved, achieved GB/s, and the bandwidth fraction (peak defaults to
v5e's ~819 GB/s).

CAVEAT for remote-tunnel devices (this dev rig): a control experiment (a
chained 256 MB `a+1`) measures an impossible 21 TB/s — per-call timing has
a ~25 us floor and does not faithfully expose memory-bound execution time,
so bw_fraction > 1 readings here mean "unmeasurable through the tunnel",
not "faster than light".  Run this harness on a directly-attached chip for
meaningful rooflines.

Usage: python -m cutesdr_tpu.bench_roofline [--peak-gbs 819]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

V5E_PEAK_GBS = 819.0


def _time_op(fn, *args, iters=100):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    t1 = (time.perf_counter() - t0)
    t0 = time.perf_counter()
    for _ in range(iters + 1):
        r = fn(*args)
    jax.block_until_ready(r)
    tn = time.perf_counter() - t0
    return max((tn - t1) / iters, 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-gbs", type=float, default=V5E_PEAK_GBS)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cutesdr_tpu.design.decimation_plan import plan_decimation
    from cutesdr_tpu.kernels.mixdec import MixDecimate
    from cutesdr_tpu.ops import decimator, fastfir, nco

    rng = np.random.default_rng(5)
    n = 1 << 22                                   # 4M samples
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    xj = jax.device_put(jnp.asarray(x))
    results = []

    def report(name, seconds, bytes_moved, note=""):
        gbs = bytes_moved / seconds / 1e9
        frac = gbs / args.peak_gbs
        r = {"op": name, "ms": round(seconds * 1e3, 3),
             "GBps": round(gbs, 1),
             "bw_fraction": round(frac, 3),
             "gsps": round(n / seconds / 1e9, 2), "note": note}
        if frac > 1.0:
            # physically impossible -> the ~25 us tunnel dispatch floor
            # swallowed the memory time; record that IN the artifact so a
            # consumer of the JSON isn't misled (CLAUDE.md tunnel caveat)
            r["trustworthy"] = False
            r["note"] = (r["note"] + "; " if r["note"] else "") + (
                "bw_fraction > 1 is impossible: timing is dispatch-floored "
                "through the remote tunnel — roofline claims need a "
                "directly-attached chip")
        results.append(r)
        print(json.dumps(r), flush=True)

    # NCO mix: read 8 B/sample, write 8 B/sample
    p, c = nco.init(123456.7, 2e6)
    f = jax.jit(lambda p, c, v: nco.process(p, c, v))
    report("nco_mix", _time_op(f, p, c, xj, iters=args.iters), 16 * n)

    # fused decimator (stride 32): read 8, write 8/32
    plan = plan_decimation(2e6, 20000.0)
    dp, dc = decimator.fused_init(plan)
    g = jax.jit(lambda p, c, v: decimator.fused_process(plan, p, c, v))
    report("fused_decimate_x32", _time_op(g, dp, dc, xj, iters=args.iters),
           int(8.25 * n))

    # pallas fused mix+decimate: same bytes as decimator alone
    md = MixDecimate(plan, 123456.7)
    k = jax.jit(lambda p, c, v: md(p, c, v))
    report("pallas_mixdec_x32",
           _time_op(k, md.params, md.init_carry(), xj, iters=args.iters),
           int(8.25 * n), "replaces nco+decimate: saves the 16 B/sample "
           "intermediate")

    # overlap-save channel filter: read 8, write 8 (+FFT flops)
    fp, fc = fastfir.init(100.0, 2800.0, 0.0, 62500.0)
    h = jax.jit(lambda p, c, v: fastfir.process(p, c, v))
    report("fastfir_2048", _time_op(h, fp, fc, xj, iters=args.iters), 16 * n,
           "5*N*log2(N) FLOP/frame on top of the bytes")

    with open("ROOFLINE.json", "w") as fo:
        json.dump(results, fo, indent=2)
    print("wrote ROOFLINE.json", file=sys.stderr)


if __name__ == "__main__":
    main()
