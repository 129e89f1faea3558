"""Multi-host bootstrap + per-process batch assembly (parallel/multihost.py).

The reference's four distributed-init idioms (SURVEY.md §2.4) have no
in-repo tests at all; here the env-resolution policy is unit-tested and the
real two-process path (coordinator handshake, global device list, sampler
sharding, local→global batch assembly, SPMD execution) runs as a subprocess
integration test on the CPU backend.
"""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from video_mamba_suite_tpu.parallel import mesh as mesh_lib
from video_mamba_suite_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_resolve_spec_env_vars():
    env = {"VMS_COORDINATOR": "h0:1234", "VMS_NUM_PROCESSES": "4",
           "VMS_PROCESS_ID": "2"}
    assert multihost.resolve_spec(env) == ("h0:1234", 4, 2)
    assert multihost.resolve_spec({}) == (None, None, None)


def test_should_initialize_detection():
    assert not multihost.should_initialize({})
    assert multihost.should_initialize({"VMS_COORDINATOR": "h0:1"})
    assert multihost.should_initialize({"SLURM_NTASKS": "8"})
    assert not multihost.should_initialize({"SLURM_NTASKS": "1"})
    assert multihost.should_initialize({"OMPI_COMM_WORLD_SIZE": "2"})
    assert not multihost.should_initialize({"OMPI_COMM_WORLD_SIZE": "1"})
    # single-worker TPU VMs export a one-entry hostname list (this very box)
    assert not multihost.should_initialize({"TPU_WORKER_HOSTNAMES": "localhost"})
    assert multihost.should_initialize({"TPU_WORKER_HOSTNAMES": "h0,h1"})


def test_initialize_noop_single_process(monkeypatch):
    for var in ("VMS_COORDINATOR", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
                "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False  # no env, no args -> no-op


def test_initialize_backend_already_bound(monkeypatch):
    """Late initialize() on a bound backend degrades to a warning, not a
    crash (jax would raise RuntimeError otherwise)."""
    monkeypatch.setenv("SLURM_NTASKS", "4")  # looks multi-process
    jax.devices()  # backend definitely bound (conftest did already)
    with pytest.warns(UserWarning, match="already"):
        assert multihost.initialize() is False


def test_local_batch_to_global_single_process_matches_shard_batch():
    m = mesh_lib.make_mesh(4, axes=("data",))
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
             "y": np.arange(8, dtype=np.int32)}
    g = multihost.local_batch_to_global(m, batch)
    s = mesh_lib.shard_batch(m, batch)
    assert g["x"].shape == (8, 3) and g["y"].shape == (8,)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    np.testing.assert_array_equal(np.asarray(g["y"]), batch["y"])
    assert g["x"].sharding.is_equivalent_to(s["x"].sharding, 2)


def test_is_primary_single_process():
    assert multihost.is_primary()


def test_sharded_epoch_order():
    from video_mamba_suite_tpu.data.sampler import sharded_epoch_order

    o0 = sharded_epoch_order(10, epoch=0)
    o1 = sharded_epoch_order(10, epoch=1)
    assert sorted(o0) == list(range(10))      # single process: full epoch
    assert o0 != o1                           # epoch-seeded reshuffle
    assert o0 == sharded_epoch_order(10, epoch=0)  # deterministic


_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon ignores JAX_PLATFORMS
    sys.path.insert(0, os.environ["VMS_REPO"])

    from video_mamba_suite_tpu.parallel import multihost, mesh as mesh_lib
    from video_mamba_suite_tpu.data.sampler import ShardedSampler
    import numpy as np

    pid = int(os.environ["VMS_PROCESS_ID"])
    assert multihost.initialize() is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert multihost.is_primary() == (pid == 0)
    n = len(jax.devices())
    assert n == 2 * len(jax.local_devices()), (n, jax.local_devices())

    # per-process sampler shards are disjoint and cover the dataset
    sampler = ShardedSampler(8, shuffle=False)
    idx = list(sampler)
    assert len(idx) == 4 and all(i % 2 == pid for i in idx), (pid, idx)

    # local -> global batch assembly + SPMD execution
    m = mesh_lib.make_mesh(axes=("data",))
    local = np.full((2, 3), float(pid), np.float32)
    g = mesh_lib.shard_batch(m, {"x": local})["x"]   # multi-process route
    assert g.shape == (4, 3), g.shape                 # global batch of 4
    out = jax.jit(lambda x: x * 2 + 1,
                  out_shardings=g.sharding)(g)
    for shard in out.addressable_shards:
        np.testing.assert_array_equal(
            np.asarray(shard.data), np.full(shard.data.shape,
                                            2.0 * pid + 1.0, np.float32))
    multihost.sync_global_devices("done")
    print("WORKER_OK", pid)
""")


@pytest.mark.skipif(jax.default_backend() != "cpu",
                    reason="subprocess CPU integration test")
def test_two_process_integration(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("VMS_", "SLURM_", "OMPI_"))}
    env.update(VMS_REPO=REPO, VMS_COORDINATOR=f"localhost:{port}",
               VMS_NUM_PROCESSES="2",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen([sys.executable, str(script)],
                         env={**env, "VMS_PROCESS_ID": str(i)},
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out
