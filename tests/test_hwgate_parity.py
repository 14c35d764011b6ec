"""Full-model parity: our Flax HWGATE vs the reference torch HWGATE with
identical weights (BASELINE.md north-star acceptance: activations allclose)."""

import numpy as np
import pytest

from tests.conftest import import_reference

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.models.hwgate import HWGATE
from sl_hwgat_tpu.train.torch_import import hwgate_from_torch

DS = {"num_class": 5, "src_len": 16}


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    hw = import_reference("models.HWGATE")
    torch.manual_seed(0)
    p = params_mod.HWGATEParams(DS, 2, device=None)
    model = hw.Model(*p.get_model_params())
    model.eval()
    return model


def test_forward_parity_eval(ref_model):
    import torch

    x = np.random.default_rng(0).normal(size=(2, 16, 64, 2)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.tensor(x)).numpy()

    ours = HWGATE(
        kp_dim=2, temporal_dim=DS["src_len"], num_classes=DS["num_class"],
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = hwgate_from_torch(sd)
    variables = jax.tree.map(jnp.asarray, variables)
    got = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_param_tree_covers_reference(ref_model):
    """Every reference weight maps into our tree and our init has no extras."""
    ours = HWGATE(kp_dim=2, temporal_dim=DS["src_len"], num_classes=DS["num_class"])
    x = jnp.zeros((1, 16, 64, 2))
    init_vars = ours.init(jax.random.PRNGKey(0), x, train=False)

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    imported = hwgate_from_torch(sd)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    assert paths(imported["params"]) == paths(init_vars["params"])
    assert paths(imported["buffers"]) == paths(init_vars["buffers"])
    for col in ("params", "buffers"):
        got_shapes = {p: None for p in paths(imported[col])}
        for p in got_shapes:
            a = imported[col]
            b = init_vars[col]
            for k in p:
                a, b = a[k], b[k]
            assert np.shape(a) == np.shape(b), (col, p, np.shape(a), np.shape(b))


def test_per_layer_activation_parity(ref_model):
    """BASELINE.md north star: per-layer activations allclose vs the
    reference with identical weights — every attention block's output."""
    import torch

    x = np.random.default_rng(3).normal(size=(2, 16, 64, 2)).astype(np.float32)

    acts = {}

    def hook(name):
        def f(_m, _i, o):
            acts[name] = o.detach().numpy()
        return f

    for i, layer in enumerate(ref_model.layers):
        for j, blk in enumerate(layer.blocks):
            blk.register_forward_hook(hook(f"layers_{i}_blocks_{j}"))
    with torch.no_grad():
        ref_model(torch.tensor(x))

    ours = HWGATE(kp_dim=2, temporal_dim=DS["src_len"], num_classes=DS["num_class"])
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, hwgate_from_torch(sd))
    _, state = ours.apply(
        variables, jnp.asarray(x), train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    inter = state["intermediates"]
    checked = 0
    for name, want in acts.items():
        got = np.asarray(inter[name]["__call__"][0])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4, err_msg=name)
        checked += 1
    assert checked == 8  # depths (2,2,4)


@pytest.mark.slow
def test_train_mode_runs_with_prune_and_dropout():
    ours = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 64, 2)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), x, train=False)
    out = ours.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1), "prune": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 5)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_full_model_pallas_impl_matches_stacked():
    """The fused Pallas path (incl. the dual-mask shifted blocks) must equal
    the stacked jnp path through the whole model. Interpreter mode on CPU."""
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 64, 2)), jnp.float32)
    stacked = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="stacked")
    fused = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="pallas")
    variables = stacked.init(jax.random.PRNGKey(0), x, train=False)
    a = stacked.apply(variables, x, train=False)
    b = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_full_model_hybrid_impl_matches_stacked():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16, 64, 2)), jnp.float32)
    stacked = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="stacked")
    hybrid = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="hybrid")
    variables = stacked.init(jax.random.PRNGKey(0), x, train=False)
    a = stacked.apply(variables, x, train=False)
    b = hybrid.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


@pytest.mark.slow
def test_remat_matches_no_remat():
    """jax.checkpoint'd blocks: identical forward and gradients."""
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16, 64, 2)), jnp.float32)
    plain = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, drop_rate=0.0,
                   prune_attn=False)
    remat = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, drop_rate=0.0,
                   prune_attn=False, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model):
        def f(params):
            out = model.apply({**variables, "params": params}, x, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out * out)
        return f

    v1, g1 = jax.value_and_grad(loss(plain))(variables["params"])
    v2, g2 = jax.value_and_grad(loss(remat))(variables["params"])
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))), g1, g2)
    assert max(jax.tree.leaves(diffs)) < 1e-5, diffs
