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


TRAIN_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from sl_hwgat_tpu.train import dist as dist_lib

dist_lib.initialize(
    coordinator_address="localhost:9877",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2

from sl_hwgat_tpu.configs import RunConfig

workdir = sys.argv[2]
cfg = RunConfig(
    dataset="SYNTH", model_type="HWGATE", mode="train", time="dist",
    input_root=os.path.join(workdir, "input"),
    output_root=os.path.join(workdir, "output", f"proc{sys.argv[1]}"),
)
cfg.epochs = 1
cfg.batch_size = 4
cfg.n_workers = 2
cfg.overrides = dict(embed_dim=32, depths=(1, 1), num_heads=(2, 2))

# Spy on sample loading: per-process input sharding must make each process
# touch ONLY the ids of its batch-row shard (VERDICT r2 item 7).
import sl_hwgat_tpu.data.dataset as ds_mod
_orig_get = ds_mod.KeypointDataset.get
_touched = set()
def _spy(self, index, epoch=0):
    _touched.add((len(self.ids), int(epoch), int(index)))  # train/val id
    # spaces overlap numerically, and the shuffled train order differs per
    # epoch — disjointness holds per (split, epoch)
    return _orig_get(self, index, epoch)
ds_mod.KeypointDataset.get = _spy

# dp mesh (the default 2-device factorization is tp-only, where both
# processes legitimately address the full batch)
results, state = dist_lib.run_distributed(cfg, mesh_shape=(2, 1, 1))
print(f"proc {sys.argv[1]} train_loss {results['train'][0]:.6f} "
      f"val_loss {results['val'][0]:.6f}", flush=True)
print(f"proc {sys.argv[1]} touched {sorted(_touched)}", flush=True)
"""


def test_two_process_training(tmp_path):
    """Full distributed training flow over 2 localhost processes: identical
    global metrics on both hosts, checkpoint written by process 0 only."""
    import re
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(str(tmp_path / "input"))
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TRAIN_WORKER, str(i), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out
    losses = {}
    touched = {}
    for o in outs:
        m = re.search(r"proc (\d) train_loss ([\d.]+) val_loss ([\d.]+)", o)
        assert m, o
        losses[m.group(1)] = (m.group(2), m.group(3))
        mt = re.search(r"proc (\d) touched (\[.*\])", o)
        assert mt, o
        touched[mt.group(1)] = set(map(tuple, eval(mt.group(2))))
    # both hosts computed identical global metrics
    assert losses["0"] == losses["1"], losses
    # per-process input sharding: each process loaded only its batch-row
    # shard of the ids — the two sets are disjoint (id-level padding of a
    # ragged final batch may duplicate at most one id per split)
    inter = touched["0"] & touched["1"]
    assert len(inter) <= 4, (sorted(inter), touched)
    assert touched["0"] and touched["1"]
    # checkpoint from process 0 only
    import glob

    assert glob.glob(str(tmp_path / "output" / "proc0" / "**" / "*best_loss.ckpt"),
                     recursive=True)
    assert not glob.glob(str(tmp_path / "output" / "proc1" / "**" / "*.ckpt"),
                         recursive=True)
