"""2-process jax.distributed smoke (VERDICT r1 #5).

The multi-host path (SURVEY.md §2.5 'Multi-host DCN':
parallel/mesh.init_distributed + per-process loader sharding) was previously
validated only at the loader-arithmetic level. This test actually brings up
a 2-process jax.distributed cluster on localhost — coordinator + worker,
one virtual CPU device each — builds the global 2-device mesh, runs a
sharded-jit global psum, and checks the cross-process loader shard split.

Runs as subprocesses because jax.distributed must initialize before any
backend exists (the parent test process already owns an 8-device CPU
backend). Skips with an explicit reason if the platform forbids the
coordinator service — the attempt stays visible either way.
"""
import socket
import subprocess
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

CHILD = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")   # sandbox pins axon via plugin

coord, pid = sys.argv[1], int(sys.argv[2])
from garmentnets_tpu.parallel.mesh import init_distributed, make_mesh
init_distributed(coordinator_address=coord, num_processes=2, process_id=pid)

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
devices = jax.devices()
assert len(devices) == 2, devices          # 1 CPU device per process

# global mesh spanning both processes; each contributes its local shard
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh()
sharding = NamedSharding(mesh, P("data"))
local = np.full((1, 4), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(sharding, local, (2, 4))

@jax.jit
def total(x):
    return x.sum()

# psum across the DCN-analogue boundary: 1*4 + 2*4 = 12
out = float(total(garr))
assert out == 12.0, out

# per-process loader sharding reads the LIVE process topology
from garmentnets_tpu.data.dataset import ConvImplicitWNFDataModule
dm = ConvImplicitWNFDataModule.__new__(ConvImplicitWNFDataModule)
dm.kwargs = {"shard_by_process": True}
mine = dm._process_shard(np.arange(10))
assert len(mine) == 5 and (mine % 2 == pid).all(), mine
print(f"proc {pid}: global sum {out} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum():
    import os
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the pytest parent runs on a virtual 8-device CPU backend
    # (conftest.py); each cluster process must own exactly ONE device
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=1"])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, coord, str(pid)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("jax.distributed 2-process smoke timed out")
    for rc, out, err in outs:
        if rc != 0 and ("UNAVAILABLE" in err or "PERMISSION" in err
                        or "unimplemented" in err.lower()):
            pytest.skip(f"platform forbids distributed coordinator: "
                        f"{err.strip().splitlines()[-1][:200]}")
        assert rc == 0, f"rc={rc}\nstdout:{out}\nstderr:{err[-2000:]}"
    assert "global sum 12.0 OK" in outs[0][1]
    assert "global sum 12.0 OK" in outs[1][1]


def test_process_shard_split_matches_live_topology():
    """The loader's cross-process split (data/dataset.py:508-523) over an
    explicit 2-process topology: disjoint, covering (up to divisibility),
    round-robin — the order-preserving split the reference's DataLoader
    sharding convention implies."""
    import numpy as np
    from garmentnets_tpu.data.dataset import ConvImplicitWNFDataModule

    dm = ConvImplicitWNFDataModule.__new__(ConvImplicitWNFDataModule)
    dm.kwargs = {"shard_by_process": True}
    idxs = np.arange(11)
    s0 = dm._process_shard(idxs, process_count=2, process_index=0)
    s1 = dm._process_shard(idxs, process_count=2, process_index=1)
    assert len(s0) == len(s1) == 5
    assert set(s0) | set(s1) == set(range(10))
    assert set(s0).isdisjoint(s1)
