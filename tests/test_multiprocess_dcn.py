"""Multi-process (DCN-path) distributed test without a cluster: two localhost
processes join via ``jax.distributed.initialize`` on the CPU backend and run a
psum + a dp-sharded computation (SURVEY.md §4.3). Opt in with RUN_DIST=1."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_DIST") != "1", reason="multi-process; set RUN_DIST=1"
)

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:9876",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.device_count() == 2, jax.device_count()
mesh = Mesh(np.asarray(jax.devices()), ("dp",))

# global batch of 4 sharded 2-per-process; loss = global mean of squares
x_local = np.full((2, 8), float(sys.argv[1]) + 1.0, np.float32)
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("dp")), x_local, (4, 8))

@jax.jit
def global_mean_sq(a):
    return jnp.mean(a ** 2)

out = float(global_mean_sq(arr))
expected = (2 * 8 * 1.0 + 2 * 8 * 4.0) / 32
assert abs(out - expected) < 1e-6, (out, expected)
print(f"proc {sys.argv[1]} ok {out}", flush=True)
"""


def test_two_process_dp():
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        outs.append(out)
        assert p.returncode == 0, out
    assert any("proc 0 ok" in o for o in outs)
    assert any("proc 1 ok" in o for o in outs)
