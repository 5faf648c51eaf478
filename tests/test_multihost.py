"""Multi-host orchestration: a REAL two-process jax.distributed job.

Spawns two local worker processes (2 virtual CPU devices each) that
rendezvous through ``initialize_multihost``, build one global 4-device
mesh spanning both processes, and run a psum over it — failing if the
mesh does not span processes.  This is the simulated-DCN test for
`zkir_tpu/parallel/multihost.py` (SURVEY §2.4 multi-host row).
"""

import socket
import subprocess
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")

from zkir_tpu.parallel.multihost import (initialize_multihost, local_lane_slice,
                                         process_info)

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
idx, count, local, global_ = process_info()
assert count == 2, f"process_count={count}"
assert local == 2, f"local_device_count={local}"
assert global_ == 4, f"global devices={global_}"

# Global mesh spanning both processes; psum must see all 4 devices.
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("lanes",))

@jax.jit
def global_sum():
    def body():
        i = jax.lax.axis_index("lanes")
        return jax.lax.psum(2 ** i, "lanes")
    return shard_map(body, mesh=mesh, in_specs=(), out_specs=P())()

total = int(global_sum())
assert total == 0b1111, f"psum over the global mesh = {total}"

lo, hi = local_lane_slice(64)
assert (lo, hi) == (32 * idx, 32 * idx + 32)
print(f"WORKER_OK {idx} psum={total} lanes={lo}:{hi}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    import os
    coord = f"127.0.0.1:{_free_port()}"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = dict(os.environ, PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), coord, str(pid)],
            cwd=str(REPO), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-2000:]}"
        assert f"WORKER_OK {pid} psum=15" in out


def test_single_process_initialize_is_noop():
    from zkir_tpu.parallel.multihost import initialize_multihost
    initialize_multihost(num_processes=1)
    initialize_multihost()
