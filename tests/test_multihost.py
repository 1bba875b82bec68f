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


TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2]),
    )
    import jax.numpy as jnp
    import numpy as np
    from tamtr_tpu.losses.detr_loss import DETRLossConfig
    from tamtr_tpu.nn.graph import TAMTRModel
    from tamtr_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from tamtr_tpu.train.trainer import TrainConfig, create_train_state, make_train_step

    assert jax.device_count() == 4 and jax.local_device_count() == 2
    mesh = make_mesh()
    B, M, nc, sz, hd = 4, 2, 5, 32, 128
    model = TAMTRModel.from_yaml("tamtr-nano.yaml", nc=nc, max_gt=M,
                                 scan_chunk=16, num_denoising=2)
    cfg = TrainConfig(batch_size=B, warmup_iters=10, epochs=2, accumulate=1)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), cfg, (B, sz, sz, 3), nc,
        steps_per_epoch=10, max_gt=M, text_dim=hd,
    )
    loss_cfg = DETRLossConfig(nc=nc)
    step = make_train_step(model, tx, loss_cfg, cfg)
    repl, bsh = replicated(mesh), batch_sharding(mesh)
    state = jax.device_put(state, repl)
    pid = jax.process_index()

    def make_global(local, shape):
        return jax.make_array_from_process_local_data(bsh, local, shape)

    rng = np.random.default_rng(7)  # SAME data on both hosts, split by rows
    img = rng.random((B, sz, sz, 3), dtype=np.float32)
    cls = rng.integers(0, nc, (B, M)).astype(np.int32)
    box = np.clip(rng.random((B, M, 4)), 0.1, 0.9).astype(np.float32)
    msk = (np.arange(M)[None] < 2).repeat(B, 0)
    txt = rng.standard_normal((B, nc, hd)).astype(np.float32)
    rows = slice(2 * pid, 2 * pid + 2)
    batch = {
        "img": make_global(img[rows], (B, sz, sz, 3)),
        "txt_feats": make_global(txt[rows], (B, nc, hd)),
        "cls": make_global(cls[rows], (B, M)),
        "bboxes": make_global(box[rows], (B, M, 4)),
        "mask": make_global(msk[rows], (B, M)),
    }
    jit_step = jax.jit(step, in_shardings=(repl, bsh, None),
                       out_shardings=(repl, repl), donate_argnums=(0,))
    new_state, m = jit_step(state, batch, jax.random.PRNGKey(3))
    loss = float(m["loss"])
    # params are replicated: every host sees the same updated vector
    psum = float(jnp.abs(new_state.params).sum())
    assert np.isfinite(loss) and int(new_state.opt_state.count) == 1
    print(f"proc{pid} TRAINOK loss={loss:.9f} psum={psum:.6f}")
    """
)


def _run_two_procs(tmp_path, worker_src, timeout=600):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
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
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-2000:]}"
    return outs


@pytest.mark.skipif(os.name != "posix", reason="posix only")
def test_two_process_mesh(tmp_path):
    outs = _run_two_procs(tmp_path, WORKER, timeout=180)
    for i, out in enumerate(outs):
        assert f"proc{i} OK" in out


@pytest.mark.skipif(os.name != "posix", reason="posix only")
def test_two_process_train_step(tmp_path):
    """The REAL train step (nano model, full loss/optimizer/EMA) across
    2 processes x 4 devices: identical loss and updated params on both
    hosts (the DDP-consistency contract, reference trainer.py:285-421)."""
    outs = _run_two_procs(tmp_path, TRAIN_WORKER, timeout=1500)  # 2 cold nano-step compiles share one host core
    lines = []
    for i, out in enumerate(outs):
        line = next(l for l in out.splitlines() if f"proc{i} TRAINOK" in l)
        lines.append(line.split("TRAINOK ")[1])
    assert lines[0] == lines[1], f"host results diverge: {lines}"
