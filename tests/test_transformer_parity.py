"""Transformer baseline forward parity vs the reference torch model."""

import numpy as np
import pytest

from tests.conftest import import_reference

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.models.transformer import TransformerClassifier
from sl_hwgat_tpu.train.torch_import import transformer_from_torch

DS = {"num_class": 7, "src_len": 16}


def test_transformer_forward_parity():
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.Transformer")
    torch.manual_seed(0)
    p = params_mod.TransformerParams(DS, 2, device=None)
    model = ref_mod.Model(*p.get_model_params())
    model.eval()

    x = np.random.default_rng(0).normal(size=(2, 16, 29, 2)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(x)).numpy()

    ours = TransformerClassifier(
        input_dim=58, num_classes=DS["num_class"], max_len=DS["src_len"], pool="mean"
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, transformer_from_torch(sd))
    got = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_transformer_bf16_compute_close_to_f32():
    import numpy as np

    from sl_hwgat_tpu.models.transformer import TransformerClassifier

    kw = dict(input_dim=58, num_classes=5, d_model=32, nhead=2,
              dim_feedforward=64, num_encoder_layers=2, dropout=0.0, max_len=8)
    f32 = TransformerClassifier(**kw)
    bf16 = TransformerClassifier(**kw, compute_dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 29, 2)), jnp.float32)
    variables = f32.init(jax.random.PRNGKey(0), x, train=False)
    a = np.asarray(f32.apply(variables, x, train=False))
    b = np.asarray(bf16.apply(variables, x, train=False))
    assert np.isfinite(b).all()
    assert np.max(np.abs(a - b)) < 0.15 * (np.max(np.abs(a)) + 1e-3)
