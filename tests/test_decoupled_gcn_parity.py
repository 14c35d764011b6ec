"""DecoupledGCN forward parity vs the reference torch model (eval mode)."""

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
