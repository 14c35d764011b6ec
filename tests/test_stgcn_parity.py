"""STGCN forward parity vs the reference torch model (eval mode, randomized
BatchNorm running stats to exercise the stats mapping)."""

import numpy as np
import pytest

from tests.conftest import import_reference

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.models.stgcn import STGCN
from sl_hwgat_tpu.train.torch_import import stgcn_from_torch

DS = {"num_class": 7, "src_len": 16}


def test_stgcn_forward_parity():
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.STGCN")
    torch.manual_seed(0)
    p = params_mod.STGCNParams(DS, 2, device=None)
    model = ref_mod.Model(*p.get_model_params())
    # randomize running stats so the importer mapping is actually tested
    g = torch.Generator().manual_seed(1)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
    model.eval()

    x = np.random.default_rng(0).normal(size=(2, 16, 29, 2)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()

    ours = STGCN(in_channels=2, edges=BODY29_EDGES, num_classes=DS["num_class"])
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, stgcn_from_torch(sd))
    got = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-4)


def test_torch_batchnorm_semantics_exact():
    """TorchBatchNorm reproduces torch _BatchNorm train-mode semantics
    exactly: biased-variance normalization, UNBIASED running-var update,
    momentum 0.1 — the convention flax's nn.BatchNorm does not implement
    (it updates with the biased variance). Caught by the STGCN
    matched-training anchor; pinned here at module level."""
    import torch

    from sl_hwgat_tpu.models.common import TorchBatchNorm

    r = np.random.default_rng(0)
    x = r.normal(size=(4, 7, 16)).astype(np.float32)  # (N, L, C) channel-last

    tbn = torch.nn.BatchNorm1d(16, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        # torch BatchNorm1d wants (N, C, L)
        want = tbn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()

    ours = TorchBatchNorm(use_running_average=False)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got, cols = ours.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(cols["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(cols["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-6)
