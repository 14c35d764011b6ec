"""Orbax checkpoint backend: round-trip equivalence with the pickle backend
and full-state resume through an Orbax directory checkpoint.

The backend stores the (variables, opt_state) pytree as a flat leaf list via
Orbax (async array I/O) plus a pickled treedef/metadata sidecar, so optax
namedtuple structure survives restore exactly (see train/checkpoint.py).
"""

import numpy as np
import pytest

pytest.importorskip("orbax.checkpoint")

from sl_hwgat_tpu.configs import RunConfig
from sl_hwgat_tpu.models import build_model
from sl_hwgat_tpu.train import checkpoint as ckpt_lib
from sl_hwgat_tpu.train.loop import init_state


def _tiny_state():
    cfg = RunConfig(dataset="SYNTH", model_type="HWGATE", mode="train")
    cfg.overrides = dict(embed_dim=32, depths=(1, 1), num_heads=(2, 2))
    model = build_model(cfg.model_type, cfg.dataset_params, cfg.input_dim, **cfg.overrides)
    state, optimizer = init_state(model, cfg, (cfg.src_len, 64, cfg.input_dim))
    state.epoch = 7
    state.history = {
        "train_loss": [1.0, 0.5], "val_loss": [1.1, 0.6],
        "train_acc": [0.2, 0.4], "val_acc": [0.1, 0.3],
    }
    return state


def _assert_trees_equal(a, b):
    la, ta = __import__("jax").tree.flatten(a)
    lb, tb = __import__("jax").tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_matches_pickle(tmp_path):
    state = _tiny_state()
    p_pickle = str(tmp_path / "ck_pickle.ckpt")
    p_orbax = str(tmp_path / "ck_orbax.ckpt")
    ckpt_lib.save_checkpoint(p_pickle, state, 5e-4, backend="pickle")
    ckpt_lib.save_checkpoint(p_orbax, state, 5e-4, backend="orbax")
    ckpt_lib.wait_until_finished()

    a = ckpt_lib.read_checkpoint(p_pickle)
    b = ckpt_lib.read_checkpoint(p_orbax)
    assert a["epoch"] == b["epoch"] == 7
    assert a["learning_rate"] == b["learning_rate"]
    assert a["train_loss_list"] == b["train_loss_list"] == [1.0, 0.5]
    _assert_trees_equal(a["variables"], b["variables"])
    _assert_trees_equal(a["opt_state"], b["opt_state"])


def test_orbax_resume_restores_structure(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "ck.ckpt")
    ckpt_lib.save_checkpoint(path, state, 5e-4, backend="orbax")

    fresh = _tiny_state()
    fresh.epoch = 0
    fresh.history = {k: [] for k in fresh.history}
    resumed = ckpt_lib.resume_from(fresh, path)
    assert resumed.epoch == 8  # epoch+1
    assert resumed.history["val_acc"] == [0.1, 0.3]
    # opt_state structure must be identical (namedtuples intact) so the jitted
    # update accepts it without retracing errors
    import jax

    assert (jax.tree.structure(resumed.opt_state)
            == jax.tree.structure(state.opt_state))


@pytest.mark.slow
def test_sharded_save_restore_on_mesh(tmp_path):
    """Sharded multihost save path (train/dist.py orbax branch): save LIVE
    sharded arrays on the 8-device CPU mesh, restore onto the same shardings,
    and verify values, treedefs, and shardings all survive."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sl_hwgat_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2, 1))
    state = _tiny_state()

    def shard(path_leaf):
        # batch-like leading dims get dp sharding when divisible; else replicate
        leaf = np.asarray(path_leaf)
        spec = P("dp") if leaf.ndim >= 1 and leaf.shape[0] % 4 == 0 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    variables = jax.tree.map(shard, state.variables)
    opt_state = jax.tree.map(shard, state.opt_state)

    path = str(tmp_path / "ck_sharded.ckpt")
    ckpt_lib.save_checkpoint_sharded(path, variables, opt_state, epoch=11,
                                     lr=3e-4, history=state.history)
    ckpt_lib.wait_until_finished()

    # restore through zeroed templates with the same shardings
    zeros_v = jax.tree.map(lambda a: jax.device_put(
        np.zeros(a.shape, a.dtype), a.sharding), variables)
    zeros_o = jax.tree.map(lambda a: jax.device_put(
        np.zeros(a.shape, a.dtype), a.sharding), opt_state)
    out = ckpt_lib.read_checkpoint_sharded(path, zeros_v, zeros_o)

    assert out["epoch"] == 11 and out["learning_rate"] == 3e-4
    assert out["train_loss_list"] == [1.0, 0.5]
    _assert_trees_equal(out["variables"], variables)
    _assert_trees_equal(out["opt_state"], opt_state)
    for orig, rest in zip(jax.tree.leaves(variables), jax.tree.leaves(out["variables"])):
        assert rest.sharding.is_equivalent_to(orig.sharding, orig.ndim)


def test_orbax_overwrite_same_path(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "ck.ckpt")
    ckpt_lib.save_checkpoint(path, state, 5e-4, backend="orbax")
    state.epoch = 9
    ckpt_lib.save_checkpoint(path, state, 1e-4, backend="orbax")
    out = ckpt_lib.read_checkpoint(path)
    assert out["epoch"] == 9
    assert out["learning_rate"] == 1e-4
