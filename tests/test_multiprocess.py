"""Multi-process (DCN-path) smoke test.

Spawns two OS processes that join a ``jax.distributed`` cluster through
``parallel.init_distributed`` (CPU backend, 4 virtual devices per process),
build a cross-process (config, point) device mesh over all 8 global devices,
and run ``sharded_robot_query`` on it.  Each worker checks its addressable
output shards against a locally-computed single-device reference.

This is the only leg of the multi-host north-star metric (BASELINE.md:28-31)
provable without pod hardware: process-spanning meshes + collectives through
the same code path a TPU pod uses (there, ``init_distributed()`` with no
arguments auto-detects the slice).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from pytorch_volumetric_tpu.parallel import init_distributed, make_device_mesh
import pytorch_volumetric_tpu.parallel as parallel
import pytorch_volumetric_tpu as pv
from pytorch_volumetric_tpu.utils.robots import make_serial_arm

pi, pc = init_distributed(f"localhost:{port}", num_processes=2,
                          process_id=proc_id)
assert (pi, pc) == (proc_id, 2), (pi, pc)
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

# identical model on both processes (same tmpdir contents via same seed)
d = sys.argv[3]
urdf_path, end_link = make_serial_arm(d, num_joints=3, segments=6, rings=2)
chain = pv.build_serial_chain_from_urdf(open(urdf_path).read(), end_link)
robot = pv.RobotSDF(chain, path_prefix=d)

mesh = make_device_mesh(n_config=4, n_point=2, devices=jax.devices())
qfn = parallel.sharded_robot_query(robot, mesh)

rng = np.random.default_rng(0)
q_np = rng.uniform(-0.5, 0.5, (8, 3)).astype(np.float32)
pts_np = rng.uniform(-0.4, 0.4, (16, 3)).astype(np.float32)

# build GLOBAL jax.Arrays from the (identical-on-every-process) host data;
# each process materializes only its addressable shards
from jax.sharding import NamedSharding, PartitionSpec as P
q_g = jax.make_array_from_callback(
    q_np.shape, NamedSharding(mesh, P("config", None)),
    lambda idx: q_np[idx])
pts_g = jax.make_array_from_callback(
    pts_np.shape, NamedSharding(mesh, P("point", None)),
    lambda idx: pts_np[idx])
v, g = qfn(q_g, pts_g)
jax.block_until_ready(v)
assert v.shape == (8, 16) and g.shape == (8, 16, 3)

# local single-device reference on the process-local default device
v_ref, g_ref = robot.query(q_np, pts_np)
v_ref = np.asarray(v_ref)
for shard in v.addressable_shards:
    got = np.asarray(shard.data)
    want = v_ref[shard.index]
    assert np.allclose(got, want, atol=1e-5), (proc_id, shard.index,
                                               np.abs(got - want).max())
print(f"DIST_OK {proc_id} shards={len(v.addressable_shards)}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("PVT_TEST_TPU"),
                    reason="CPU-only multi-process smoke")
def test_two_process_distributed_query(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=str(tmp_path)) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for pp in procs:
                pp.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out, out
