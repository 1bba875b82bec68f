"""Multi-host data parallelism smoke: 2 processes x 4 virtual CPU devices.

Verifies the §2.5/§5.8 capability without hardware: `jax.distributed`
initialization, a global 8-device mesh built through `tamtr_tpu.parallel`,
per-host batch sharding with `shard_batch`, and a jitted global-sum (the
gradient-allreduce pattern) agreeing across hosts.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1],
        num_processes=2,
        process_id=int(sys.argv[2]),
    )
    import jax.numpy as jnp
    import numpy as np
    from tamtr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    assert jax.device_count() == 8 and jax.local_device_count() == 4
    mesh = make_mesh()
    bsh = batch_sharding(mesh)

    # global batch 8, each host owns 4 rows; build the global array from
    # per-host shards (the multi-host data-loading pattern)
    pid = jax.process_index()
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid
    global_shape = (8, 3)
    arr = jax.make_array_from_process_local_data(bsh, local, global_shape)

    @jax.jit
    def global_sum(x):
        return x.sum()

    total = float(global_sum(arr))
    expect = float(np.arange(12).sum() * 2 + 100 * 12)  # both hosts' shards
    assert abs(total - expect) < 1e-3, (total, expect)
    print(f"proc{pid} OK total={total}")
    """
)


@pytest.mark.skipif(os.name != "posix", reason="posix only")
def test_two_process_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": os.getcwd()}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
        assert f"proc{i} OK" in out
