"""Finetune-from-reference capability: a real torch ``.pt`` checkpoint file
(as written by the reference's save_checkpoint, incl. optimizer state) loads
into our train state with shape-checked partial transfer."""

import numpy as np
import pytest

from tests.conftest import import_reference


DS = {"num_class": 5, "src_len": 16}


@pytest.mark.slow
def test_pt_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    params_mod = import_reference("models.model_params")
    hw = import_reference("models.HWGATE")
    torch.manual_seed(0)
    model = hw.Model(*params_mod.HWGATEParams(DS, 2, device=None).get_model_params())
    opt = torch.optim.AdamW(model.parameters(), lr=5e-4)
    path = tmp_path / "model_best_loss.pt"
    torch.save(
        {
            "model_state_dict": model.state_dict(),
            "optimizer_state_dict": opt.state_dict(),
            "epoch": 3,
            "learning_rate": 5e-4,
        },
        str(path),
    )

    import jax

    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train import checkpoint as ckpt_lib
    from sl_hwgat_tpu.train.loop import init_state

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    # new-vocab head (7 classes ≠ 5): body transfers, head keeps fresh init
    ours = HWGATE(kp_dim=2, temporal_dim=16, num_classes=7)
    state, _ = init_state(ours, Cfg, (16, 64, 2), ("dropout", "prune"))
    head_before = np.asarray(state.variables["params"]["head"]["kernel"]).copy()
    state = ckpt_lib.load_pretrained_into(state, str(path), "HWGATE", verbose=False)

    np.testing.assert_array_equal(state.variables["params"]["head"]["kernel"], head_before)
    wqkv = model.state_dict()["layers.0.blocks.0.attn.qkv.weight"].numpy()
    third = wqkv.shape[0] // 3
    np.testing.assert_allclose(
        state.variables["params"]["layers_0_blocks_0"]["attn"]["q"]["kernel"],
        wqkv[:third].T, atol=0,
    )
    np.testing.assert_allclose(
        state.variables["params"]["layers_0_blocks_0"]["attn"]["v"]["kernel"],
        wqkv[2 * third:].T, atol=0,
    )
    # buffers transferred too (Fourier B drives the embedding)
    np.testing.assert_allclose(
        state.variables["buffers"]["fourier"]["B"], model.B.detach().numpy(), atol=0
    )
