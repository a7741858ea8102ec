"""Multi-process distributed test: two processes, each with 2 virtual CPU
devices, form a 4-device global 't' mesh; per-host ingest slices assemble
into one global array and a sharded computation reduces across hosts."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, os.getcwd())
    from cutesdr_tpu.shard.multihost import HostShardedStream, global_time_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = global_time_mesh()
    assert mesh.devices.size == 2 * nproc
    hs = HostShardedStream(mesh, block_per_device=256)
    # host p contributes samples [p*512, (p+1)*512) of the global ramp
    base = pid * hs.local_samples_per_superblock
    local = (np.arange(base, base + hs.local_samples_per_superblock)
             .astype(np.complex64))
    arr = hs.assemble(local)
    assert arr.shape == (hs.global_samples_per_superblock,)

    @jax.jit
    def total(a):
        return jnp.sum(a.real)

    t = float(total(arr))
    n = hs.global_samples_per_superblock
    expect = n * (n - 1) / 2
    assert abs(t - expect) < 1e-3 * expect, (t, expect)
    print(f"proc {pid}: OK sum={t}")
""")


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    port = "45677"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "PYTHONPATH")}
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), "2", port],
            env=env, cwd=os.getcwd(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "OK sum=" in out
