"""On-chip compile sweep: every representative config must compile AND run
on the real TPU in bounded time.

The CPU test suite cannot catch two whole classes of TPU-only failures:
Mosaic lowering legality (tile shapes) and XLA:TPU compile-time
pathologies (round 3 found both: an illegal 16-column mixdec output tile,
and minute-scale compiles for the x16 decimation conv and SAM's ~1900-tap
locked-loop kernel).  This harness sweeps the mode families x rates x
latency variants that production reaches and fails loudly if any config
errors or exceeds the compile budget.

Usage:  python -m cutesdr_tpu.tpu_compile_sweep [--budget-s 120]
Run on hardware (the axon tunnel or an attached chip); compiles are
cached, so a clean rerun takes ~30 s total.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_configs():
    from cutesdr_tpu.design.latency import choose_fastfir_sizes
    from cutesdr_tpu.pipeline.receiver import ReceiverConfig

    configs = []
    for fs, mode in [(196608.0, "am"), (250_000.0, "fm"), (500_000.0, "sam"),
                     (2e6, "usb"), (2e6, "cwu"), (10e6, "usb"),
                     (20e6, "lsb")]:
        configs.append((f"{mode}@{fs / 1e6:g}M", ReceiverConfig(
            input_rate=fs, mode=mode, audio_rate=48000.0)))
    for fs, mode in [(250_000.0, "usb"), (2e6, "am")]:
        c = choose_fastfir_sizes(
            ReceiverConfig(input_rate=fs, mode=mode, audio_rate=48000.0),
            0.010)
        configs.append((f"{mode}@{fs / 1e6:g}M/10ms", c))
    configs.append(("fm-st-nb@2M", ReceiverConfig(
        input_rate=2e6, mode="fm", stereo=True, nb_on=True,
        audio_rate=48000.0)))
    return configs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=120.0,
                    help="per-config compile budget (uncached first run "
                         "through a remote tunnel may need more)")
    args = ap.parse_args(argv)

    import os

    import numpy as np

    import jax
    cache = os.path.join(os.getcwd(), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from cutesdr_tpu.pipeline.receiver import Receiver

    fails = 0
    for name, cfg in build_configs():
        t0 = time.perf_counter()
        try:
            rx = Receiver(cfg)
            out = rx.process_host(np.zeros(cfg.block_size, np.complex64))
            jax.block_until_ready(out.audio)
            dt = time.perf_counter() - t0
            status = "OK" if dt <= args.budget_s else "SLOW"
            if status == "SLOW":
                fails += 1
            print(f"{name:16s} impl={cfg.decimator_impl:8s} "
                  f"block={cfg.block_size:7d} compile {dt:6.1f}s {status}",
                  flush=True)
        except Exception as e:
            fails += 1
            print(f"{name:16s} FAILED: {str(e)[:200]}", flush=True)
    # scalar-core sequential kernels (r5): the receiver configs above
    # compile them inside the tier conds, but zeros input never EXECUTES
    # the scan tier — drive them directly and check against the XLA scan
    # (kernels/seqloop; catches scalar-op legality AND runtime numerics)
    t0 = time.perf_counter()
    try:
        import jax.numpy as jnp

        from cutesdr_tpu.demod import fm, sam
        from cutesdr_tpu.kernels import seqloop
        rng = np.random.default_rng(0)
        n = 4096
        x = ((rng.standard_normal(n) + 1j * rng.standard_normal(n))
             * 3000).astype(np.complex64)
        re = jnp.asarray(x.real)
        im = jnp.asarray(x.imag)
        theta = jax.jit(lambda r, i: jnp.arctan2(i, r))(re, im)
        p, c = fm.init(62500.0)
        want = fm._pll_scan(p, c, theta)
        ph2, fr2, freqs, err2 = seqloop.fm_pll_scan(
            p.pll_alpha, p.pll_beta, p.nco_limit,
            c.nco_phase, c.nco_freq, theta)
        audio2, _dc2 = fm._dc_track(p, freqs, c.freq_error_dc)
        da = float(jnp.max(jnp.abs(want[3] - audio2)))
        scale = float(jnp.max(jnp.abs(want[3]))) + 1e-30
        assert da / scale < 1e-5, f"fm audio diff {da / scale:g}"
        ps, cs = sam.init(62500.0)
        wants = sam._pll_scan(ps, cs, theta)
        gots = seqloop.sam_pll_scan(ps.pll_alpha, ps.pll_beta,
                                    ps.nco_limit, cs.nco_phase,
                                    cs.nco_freq, theta)
        dp = float(jnp.max(jnp.abs(wants[2] - gots[2])))
        assert dp < 1e-4, f"sam prev diff {dp:g}"
        print(f"{'seqloop-exec':16s} fm/sam vs XLA scan OK "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    except Exception as e:
        fails += 1
        print(f"{'seqloop-exec':16s} FAILED: {str(e)[:200]}", flush=True)

    n = len(build_configs()) + 1
    print(f"sweep: {n - fails}/{n} configs within budget", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
