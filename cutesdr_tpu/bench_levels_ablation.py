"""Levels-stage (S-meter + AGC) ablation: where does its time go?

DESIGN §30: the stage's sub-ops are far below the tunnel's sustained
DISPATCH-RATE floor (~0.2-0.3 ms/step — a trivial elementwise step
"measures" the same as a full sub-pipeline), so naive single-dispatch
slope chains cannot resolve them.  Each variant here therefore applies
its sub-op M times INSIDE one jitted step, data-chained so XLA cannot
CSE the repeats, and reports slope/M — the honest per-application cost.

Variants (flagship audio-rate geometry: 262,144 samples at 62.5 kHz,
the ×32 chain's decimated block):

  full_levels  — smeter.process(fast) + agc.process, as receiver._levels
  agc_full     — agc.process alone (prefix + averagers + gain)
  smeter       — smeter.process(fast) alone (power-dB mag + fused kernel)
  prefix       — agc._prefix (delay line, log-mag, van Herk window max)
  averagers    — agc._averager (both guess-verify two-rate solves)
  winmax       — ops/util.sliding_window_max alone
  gain         — agc._apply_gain alone

Usage:  python -m cutesdr_tpu.bench_levels_ablation [--n N] [--m M]
Writes a "levels_ablation" entry into BENCH_DETAILS.json.

Reference being decomposed: the AGC/S-meter pair of
/root/reference/dsp/agc.cpp:174-296 and gui/meter.cpp, which the
receiver runs per audio block (pipeline/receiver._levels).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPS = 5
M_DEFAULT = 16


def _enable_compile_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def run(n: int, m: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cutesdr_tpu import bench_stages as bs
    from cutesdr_tpu.ops import agc as agc_ops
    from cutesdr_tpu.ops import smeter as sm_ops
    from cutesdr_tpu.ops.util import sliding_window_max

    fs = 62500.0
    cfg = agc_ops.AgcConfig(True, False, fs)
    params = agc_ops.make_params(cfg, -100.0, 30.0, 0.0, 200.0,
                                 jnp.float32)
    carry0 = agc_ops.init_carry(cfg, complex_input=True,
                                rdtype=jnp.float32)
    smp, smc0 = sm_ops.init(fs, jnp.float32)

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32)) * 0.3
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32)) * 0.3

    def rep(body):
        def step(p, state, re, im):
            s, r = state, re
            for k in range(m):
                s, r = body(s, r, im)
                # tiny data perturbation defeats CSE without changing
                # the op mix
                r = r + jnp.float32(1e-12) * k
            return s, jnp.sum(r)
        return jax.jit(step)

    def full_levels(state, r, im):
        agc_c, sm_c = state
        x = jax.lax.complex(r, im)
        sm_c, _ = sm_ops.process(smp, sm_c, x, fast=True)
        agc_c, y = agc_ops.process(cfg, params, agc_c, x)
        return (agc_c, sm_c), jnp.real(y) + jnp.imag(y)

    def agc_full(state, r, im):
        agc_c, sm_c = state
        x = jax.lax.complex(r, im)
        agc_c, y = agc_ops.process(cfg, params, agc_c, x)
        return (agc_c, sm_c), jnp.real(y) + jnp.imag(y)

    def smeter(state, r, im):
        agc_c, sm_c = state
        x = jax.lax.complex(r, im)
        sm_c, _ = sm_ops.process(smp, sm_c, x, fast=True)
        bump = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(sm_c)
                   if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating))
        return (agc_c, sm_c), r + bump * 0

    def prefix(state, r, im):
        agc_c, sm_c = state
        x = jax.lax.complex(r, im)
        delayed, nsd, peak, mt = agc_ops._prefix(cfg, agc_c, x)
        agc_c = agc_c._replace(sig_delay=nsd, mag_tail=mt)
        return (agc_c, sm_c), peak + jnp.real(delayed)

    def averagers(state, r, im):
        agc_c, sm_c = state
        a, d, timer, magsel = agc_ops._averager(cfg, params, agc_c, r)
        agc_c = agc_c._replace(attack_ave=a, decay_ave=d,
                               hang_timer=timer)
        return (agc_c, sm_c), magsel

    def winmax(state, r, im):
        agc_c, sm_c = state
        peak, mt = sliding_window_max(r, cfg.window_samples,
                                      agc_c.mag_tail)
        agc_c = agc_c._replace(mag_tail=mt)
        return (agc_c, sm_c), peak

    def gain(state, r, im):
        agc_c, sm_c = state
        x = jax.lax.complex(r, im)
        y = agc_ops._apply_gain(params, r, x)
        return (agc_c, sm_c), jnp.real(y) + jnp.imag(y)

    variants = [("full_levels", full_levels), ("agc_full", agc_full),
                ("smeter", smeter), ("prefix", prefix),
                ("averagers", averagers), ("winmax", winmax),
                ("gain", gain)]

    state0 = (carry0, smc0)
    stages = {}
    for name, fn in variants:
        j = rep(fn)
        slopes = bs.slope_times(j, None, state0, re, im, k1=2, k2=8,
                                reps=REPS)
        slopes = sorted(s for s in slopes if s > 0)
        med = slopes[len(slopes) // 2] / m if slopes else float("nan")
        stages[name] = {
            "ms": round(med * 1e3, 4),
            "ms_all": [round(s * 1e3 / m, 4) for s in slopes],
        }
        print(f"{name:12s} {med*1e3:8.4f} ms/application  "
              f"all={stages[name]['ms_all']}", file=sys.stderr,
              flush=True)
    return stages


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--m", type=int, default=M_DEFAULT)
    args = ap.parse_args()
    _enable_compile_cache()
    stages = run(args.n, args.m)
    row = {
        "config": "levels_ablation",
        "block": args.n,
        "in_jit_reps": args.m,
        "fence": "d2h_slope",
        "reps": REPS,
        "stages": stages,
        "note": ("per-application cost via M data-chained in-jit repeats "
                 "(sub-ops sit below the tunnel's ~0.2-0.3 ms dispatch-"
                 "rate floor and cannot be resolved by single-dispatch "
                 "chains — DESIGN 30); averagers = both guess-verify "
                 "two-rate solves, the stage's dominant term"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAILS.json")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            rows = json.load(f)
    rows = [r for r in rows if r.get("config") != "levels_ablation"]
    rows.append(row)
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
