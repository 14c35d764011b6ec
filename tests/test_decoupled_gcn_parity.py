"""DecoupledGCN forward parity vs the reference torch model.

Eval-mode full-model parity, plus the TRAIN-mode anchor: DropGraph is driven
by Bernoulli draws from each framework's own RNG (torch global vs jax
``dropgraph`` stream), which can never be seed-matched — so the train-mode
tests inject one SHARED uniform sequence into both sides (``mask = u < p``)
and compare the full train-mode forward (batch-stat BN + 16 aligned DropGraph
draws) end to end. ≡ reference `models/DecoupledGCN.py:29-82,116-120,299-322`.
"""

import numpy as np
import pytest

from tests.conftest import import_reference

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.models.decoupled_gcn import DecoupledGCN
from sl_hwgat_tpu.train.torch_import import decoupled_gcn_from_torch

DS = {"num_class": 7, "src_len": 16}


def test_decoupled_gcn_forward_parity():
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.DecoupledGCN")
    torch.manual_seed(0)
    p = params_mod.DecoupledGCNParams(DS, 2, device=None)
    model = ref_mod.Model(*p.get_model_params())
    g = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()

    x = np.random.default_rng(0).normal(size=(2, 16, 29, 2)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()

    ours = DecoupledGCN(in_channels=2, edges=BODY29_EDGES, num_classes=DS["num_class"])
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, decoupled_gcn_from_torch(sd))
    got = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-4)


class _SharedUniforms:
    """One deterministic uniform stream consumed by both frameworks in the
    same draw order: size-1 axes are squeezed so torch's (n,1,t) temporal
    probabilities and jax's (n,t) consume identical draws."""

    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)
        self.n_draws = 0

    def draw(self, shape):
        self.n_draws += 1
        return self.rng.uniform(size=tuple(s for s in shape if s != 1)).astype(
            np.float32)


def _fake_torch_bernoulli(seq, torch):
    def fake(p):
        arr = p.detach().cpu().numpy()
        u = seq.draw(arr.shape)
        return torch.tensor((u < arr.reshape(u.shape)).astype(np.float32)
                            ).reshape(p.shape)

    return fake


def _fake_jax_bernoulli(seq):
    def fake(rng, p=0.5, shape=None):
        arr = np.asarray(p)
        return jnp.asarray(seq.draw(arr.shape)).reshape(arr.shape) < p

    return fake


def test_decoupled_gcn_train_mode_parity_with_injected_dropgraph(monkeypatch):
    """Full train-mode forward (DropGraph ACTIVE on the last four blocks,
    batch-stat BN) matches the reference given a shared uniform stream."""
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.DecoupledGCN")
    torch.manual_seed(0)
    p = params_mod.DecoupledGCNParams(DS, 2, device=None)
    model = ref_mod.Model(*p.get_model_params())
    model.train()

    x = np.random.default_rng(5).normal(size=(3, 16, 29, 2)).astype(np.float32)

    seq_t = _SharedUniforms(seed=42)
    monkeypatch.setattr(torch, "bernoulli", _fake_torch_bernoulli(seq_t, torch))
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()
    # 4 kp<0.9 blocks × (y-spatial, y-temporal, skip-spatial, skip-temporal)
    assert seq_t.n_draws == 16

    ours = DecoupledGCN(in_channels=2, edges=BODY29_EDGES, num_classes=DS["num_class"])
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, decoupled_gcn_from_torch(sd))

    seq_j = _SharedUniforms(seed=42)
    monkeypatch.setattr(jax.random, "bernoulli", _fake_jax_bernoulli(seq_j))
    got, _ = ours.apply(
        variables, jnp.asarray(x), train=True,
        rngs={"dropout": jax.random.key(0), "dropgraph": jax.random.key(1)},
        mutable=["batch_stats"])
    assert seq_j.n_draws == 16
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_drop_graph_functions_match_reference(monkeypatch):
    """Unit-level: our channel-last DropGraph S/T vs the reference modules on
    a shared mask — pins the dilation, adjacency spread, thresholds, and the
    mask renormalization exactly. ≡ `models/DecoupledGCN.py:29-82`."""
    torch = pytest.importorskip("torch")
    ref_mod = import_reference("models.DecoupledGCN")
    from sl_hwgat_tpu.graphs.partition import spatial_graph
    from sl_hwgat_tpu.models.decoupled_gcn import (drop_graph_spatial,
                                                   drop_graph_temporal,
                                                   find_drop_size)

    n, c, t, v = 2, 5, 12, 29
    keep_prob, block_size = 0.9, 5
    edges = [list(e) for e in BODY29_EDGES]
    adj_sum = spatial_graph(v, edges).astype(np.float32).sum(axis=0)
    drop_size = find_drop_size(v, len(edges))
    x = np.random.default_rng(2).normal(size=(n, c, t, v)).astype(np.float32)
    x_cl = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # (N, T, V, C)

    # temporal
    seq_t, seq_j = _SharedUniforms(3), _SharedUniforms(3)
    monkeypatch.setattr(torch, "bernoulli", _fake_torch_bernoulli(seq_t, torch))
    mod = ref_mod.DropGraphTemporal(block_size=block_size)
    mod.train()
    with torch.no_grad():
        want = mod(torch.tensor(x), keep_prob).numpy()
    monkeypatch.setattr(jax.random, "bernoulli", _fake_jax_bernoulli(seq_j))
    got = drop_graph_temporal(x_cl, keep_prob, block_size, jax.random.key(0))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5, rtol=1e-5)

    # spatial
    seq_t, seq_j = _SharedUniforms(4), _SharedUniforms(4)
    monkeypatch.setattr(torch, "bernoulli", _fake_torch_bernoulli(seq_t, torch))
    mod = ref_mod.DropGraphSpatial(num_points=v, drop_size=drop_size)
    mod.train()
    with torch.no_grad():
        want = mod(torch.tensor(x), keep_prob, torch.tensor(adj_sum)).numpy()
    monkeypatch.setattr(jax.random, "bernoulli", _fake_jax_bernoulli(seq_j))
    got = drop_graph_spatial(x_cl, keep_prob, jnp.asarray(adj_sum), drop_size,
                             jax.random.key(0))
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=1e-5, rtol=1e-5)
