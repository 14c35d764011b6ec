"""Forward parity for HGATE / WGATE / GATE vs the reference torch models with
identical weights (eval mode)."""

import numpy as np
import pytest

from tests.conftest import import_reference

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.models.gate import GATE
from sl_hwgat_tpu.models.hgate import HGATE
from sl_hwgat_tpu.models.wgate import WGATE
from sl_hwgat_tpu.train.torch_import import gat_family_from_torch

DS = {"num_class": 5, "src_len": 16}


def _ref(model_name):
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    mod = import_reference(f"models.{model_name}")
    torch.manual_seed(0)
    p = getattr(params_mod, model_name + "Params")(DS, 2, device=None)
    model = mod.Model(*p.get_model_params())
    model.eval()
    return model


def _compare(ref_model, ours, x, atol=2e-4):
    import torch

    with torch.no_grad():
        want = ref_model(torch.tensor(x)).numpy()
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, gat_family_from_torch(sd))
    got = ours.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-4)


def test_hgate_parity():
    x = np.random.default_rng(0).normal(size=(2, 16, 29, 2)).astype(np.float32)
    _compare(_ref("HGATE"), HGATE(kp_dim=2, temporal_dim=16, num_classes=5), x)


def test_wgate_parity():
    x = np.random.default_rng(1).normal(size=(2, 16, 64, 2)).astype(np.float32)
    _compare(_ref("WGATE"), WGATE(kp_dim=2, temporal_dim=16, num_classes=5), x)


def test_gate_parity():
    x = np.random.default_rng(2).normal(size=(2, 16, 29, 2)).astype(np.float32)
    _compare(_ref("GATE"), GATE(kp_dim=2, temporal_dim=16, num_classes=5), x)


@pytest.mark.slow
def test_wgate_gate_bf16_compute_close_to_f32():
    """Mixed precision on the banded models: bf16 forward stays close to f32
    (scores/softmax remain f32; projections and AV run bf16)."""
    import numpy as np

    from sl_hwgat_tpu.models.wgate import WGATE
    from sl_hwgat_tpu.models.gate import GATE

    for cls, kps in ((WGATE, 64), (GATE, 29)):
        f32 = cls(kp_dim=2, num_kps=kps, temporal_dim=8, num_classes=5,
                  embed_dim=32, depths=2, num_heads=2, drop_rate=0.0)
        bf16 = cls(kp_dim=2, num_kps=kps, temporal_dim=8, num_classes=5,
                   embed_dim=32, depths=2, num_heads=2, drop_rate=0.0,
                   compute_dtype="bfloat16")
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, kps, 2)),
                        jnp.float32)
        variables = f32.init(jax.random.PRNGKey(0), x, train=False)
        a = np.asarray(f32.apply(variables, x, train=False))
        b = np.asarray(bf16.apply(variables, x, train=False))
        assert np.isfinite(b).all()
        assert np.max(np.abs(a - b)) < 0.15 * (np.max(np.abs(a)) + 1e-3), cls.__name__
