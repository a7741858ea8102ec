"""Resampler ablation: which term sets the resample tail's speed?

The r5 flagship stage budget (stage_budget_usb2m) puts the resample tail
at 0.76 ms/8.4M-sample block — the LARGEST stage share (36.6%), ahead of
the mixdec front end.  This harness times slope-fenced ablation variants
of the production ``ops.resampler.process`` (the ``_stage=``
instrumentation):

  gather  — timestamp math + whole-row window gather + reduce
            (weights replaced by a broadcast constant)
  window  — + the rank-8 separable Blackman-Harris window term
  sinc    — + the sine/parity/reciprocal sinc term (window skipped)
  full    — production weights (window × sinc)

and derives the per-term decomposition by subtraction, alongside the
analytic op-count ceilings.  The candidate levers the decomposition
discriminates between:

  * the sv weight tensor ([n_chunks, 64, M] f32, ~206 MB/flagship block)
    failing to fuse and round-tripping HBM — would show as a large
    common cost in EVERY weighted variant;
  * the division in the sinc term (~7x a VPU multiply);
  * the row gather itself (~0.3 ms analytic).

Timing is the r4 D2H-slope fence (see bench_stages docstring — the only
honest fence through the axon tunnel).

Usage:  python -m cutesdr_tpu.bench_resamp_ablation [--block N]
Writes a "resamp_ablation" entry into BENCH_DETAILS.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPS = 5


def _enable_compile_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def _slope(step, params, carry, x, k1=8, k2=128):
    import jax.numpy as jnp
    c, y, nv = step(params, carry, x)
    float(jnp.sum(y))
    carry0 = c
    slopes = []
    for _ in range(REPS):
        ts = {}
        for k in (k1, k2):
            t0 = time.perf_counter()
            c = carry0
            for _ in range(k):
                c, y, nv = step(params, c, x)
            float(jnp.sum(y))
            ts[k] = time.perf_counter() - t0
        slopes.append((ts[k2] - ts[k1]) / (k2 - k1))
    slopes.sort()
    return slopes[len(slopes) // 2], slopes


def run(block=262_144, in_rate=62_500.0, out_rate=48_000.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutesdr_tpu.ops import resampler

    rate = in_rate / out_rate
    max_out = resampler.max_out_for(block, rate)
    params, carry0 = resampler.init(rate)
    rng = np.random.default_rng(7)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal(block).astype(np.float32)))
    print(f"resampler ablation: {block} in -> {max_out} out cap, "
          f"rate {rate:.6f}", file=sys.stderr)

    rows = {}
    for stage in ("gather", "window", "sinc", "full"):
        step = jax.jit(functools.partial(
            resampler.process, max_out=max_out, interp=True, _stage=stage))
        med, slopes = _slope(step, params, carry0, x)
        rows[stage] = {"ms": round(med * 1e3, 4),
                       "ms_all": [round(s * 1e3, 4) for s in slopes]}
        print(f"  {stage:>7}: {med * 1e3:.3f} ms/block "
              f"({[round(s * 1e3, 3) for s in slopes]})", file=sys.stderr)

    # r5 static-polyphase conv fast path (exact rational ratio)
    rat = resampler.rational_for(in_rate, out_rate)
    if rat is not None:
        step = jax.jit(functools.partial(
            resampler.process, max_out=max_out, interp=True, rational=rat))
        med, slopes = _slope(step, params, carry0, x)
        rows["rational"] = {"ms": round(med * 1e3, 4), "pq": list(rat),
                            "ms_all": [round(s * 1e3, 4) for s in slopes]}
        print(f"  rational: {med * 1e3:.3f} ms/block "
              f"({[round(s * 1e3, 3) for s in slopes]})  p/q={rat}",
              file=sys.stderr)

    g = rows["gather"]["ms"]
    decomp = {
        "gather_base_ms": g,
        "window_term_ms": round(rows["window"]["ms"] - g, 4),
        "sinc_term_ms": round(rows["sinc"]["ms"] - g, 4),
        "combine_residual_ms": round(
            rows["full"]["ms"] - rows["window"]["ms"]
            - (rows["sinc"]["ms"] - g), 4),
    }
    print(f"decomposition: {decomp}", file=sys.stderr)

    entry = {
        "config": "resamp_ablation",
        "block": block,
        "rate": rate,
        "max_out": max_out,
        "fence": "d2h_slope",
        "reps": REPS,
        "stages": rows,
        "decomposition_ms": decomp,
    }
    return entry


def _update_details(entry):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows = [r for r in rows if r.get("config") != entry["config"]]
    rows.append(entry)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"updated {path}", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=262_144)
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args(argv)
    _enable_compile_cache()
    entry = run(block=args.block)
    print(json.dumps(entry))
    if not args.no_write:
        _update_details(entry)


if __name__ == "__main__":
    main()
