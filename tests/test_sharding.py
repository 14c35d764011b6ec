"""Multi-device sharding tests on the virtual 8-device CPU mesh:
dp/sp/tp-sharded training step matches the single-device result."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.models.hwgate import HWGATE
from sl_hwgat_tpu.parallel import make_mesh, make_sharded_steps, mesh_shape_for
from sl_hwgat_tpu.train.loop import init_state, make_steps
from sl_hwgat_tpu.train.state import make_optimizer


class Cfg:
    seed = 0
    optimizer_type = "adamw"
    lr = 5e-4


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
    )
    state, optimizer = init_state(model, Cfg, (16, 64, 2), ("dropout",))
    r = np.random.default_rng(0)
    x = r.normal(size=(8, 16, 64, 2)).astype(np.float32)
    y = r.integers(0, 6, size=(8,)).astype(np.int32)
    valid = np.ones(8, np.float32)
    return model, optimizer, state, x, y, valid


def test_mesh_shape_factorization():
    assert np.prod(mesh_shape_for(8)) == 8
    assert np.prod(mesh_shape_for(16)) == 16
    assert np.prod(mesh_shape_for(1)) == 1


def test_sharded_train_step_matches_single_device(setup):
    model, optimizer, state, x, y, valid = setup
    key = jax.random.PRNGKey(0)

    # single-device reference step
    train_ref, eval_ref = make_steps(model, optimizer, rng_streams=("dropout",), donate=False)
    v1, o1, loss1, c1, n1 = train_ref(
        state.variables, state.opt_state, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(valid), key, 0, 0,
    )

    mesh = make_mesh((2, 2, 2))
    train_sh, eval_sh, vars_sh, opt_sh = make_sharded_steps(
        model, optimizer, mesh, state.variables, state.opt_state,
        rng_streams=("dropout",),
    )
    v2, o2, loss2, c2, n2 = train_sh(
        vars_sh, opt_sh, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), key, 0, 0
    )
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(float(c1), float(c2), atol=1e-6)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        v1["params"], v2["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_sharded_eval_matches(setup):
    model, optimizer, state, x, y, valid = setup
    mesh = make_mesh((2, 2, 2))
    _, eval_sh, vars_sh, _ = make_sharded_steps(
        model, optimizer, mesh, state.variables, state.opt_state, rng_streams=("dropout",),
    )
    _, eval_ref = make_steps(model, optimizer, rng_streams=("dropout",), donate=False)
    l1, c1, n1, p1 = eval_ref(state.variables, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), 2)
    l2, c2, n2, p2 = eval_sh(vars_sh, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), 2)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


@pytest.mark.slow
def test_sharded_steps_with_fused_pallas_kernel(setup):
    """make_sharded_steps activates the kernel_sharding context, so a model
    pinned to attn_impl='pallas' traces through the shard_map'd fused kernel
    under the GSPMD-sharded jit and matches the stacked single-device step."""
    model, optimizer, state, x, y, valid = setup
    fused_model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    key = jax.random.PRNGKey(0)
    train_ref, _ = make_steps(model, optimizer, rng_streams=("dropout",), donate=False)
    v1, o1, loss1, c1, n1 = train_ref(
        state.variables, state.opt_state, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(valid), key, 0, 0,
    )
    mesh = make_mesh((2, 2, 2))
    train_sh, eval_sh, vars_sh, opt_sh = make_sharded_steps(
        fused_model, optimizer, mesh, state.variables, state.opt_state,
        rng_streams=("dropout",),
    )
    v2, o2, loss2, c2, n2 = train_sh(
        vars_sh, opt_sh, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), key, 0, 0
    )
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        v1["params"], v2["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


@pytest.mark.slow
def test_sharded_steps_with_hybrid_impl(setup):
    """attn_impl='hybrid' under the GSPMD-sharded step (selectable via
    --attn-impl; auto uses the fully-fused kernel) must match the stacked
    single-device step."""
    model, optimizer, state, x, y, valid = setup
    hybrid_model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="hybrid",
    )
    key = jax.random.PRNGKey(0)
    train_ref, _ = make_steps(model, optimizer, rng_streams=("dropout",), donate=False)
    v1, o1, loss1, c1, n1 = train_ref(
        state.variables, state.opt_state, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(valid), key, 0, 0,
    )
    mesh = make_mesh((2, 2, 2))
    train_sh, _, vars_sh, opt_sh = make_sharded_steps(
        hybrid_model, optimizer, mesh, state.variables, state.opt_state,
        rng_streams=("dropout",),
    )
    v2, o2, loss2, c2, n2 = train_sh(
        vars_sh, opt_sh, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), key, 0, 0
    )
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
