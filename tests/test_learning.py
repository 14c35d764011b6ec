"""Learning sanity: the flagship fits a deterministic synthetic task
(overfit check — catches gradient/optimizer/masking bugs that shape tests
can't). Slow (~3 min CPU); opt in with RUN_SLOW=1.

Context: with the reference's full augmentation pipeline and 500-epoch
training regime, short runs stay near chance; this test removes stochastic
augmentation (eval transform, no prune/dropout) so 40 epochs suffice.
"""

import os
import pickle

import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("RUN_SLOW") != "1", reason="slow; set RUN_SLOW=1"),
]


def test_hwgate_overfits_deterministic_synthetic(tmp_path):
    import jax

    from sl_hwgat_tpu.configs import build_eval_transform
    from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader
    from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset
    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.loop import init_state, make_steps, train_epoch

    write_synthetic_dataset(str(tmp_path / "input"), num_classes=8, clips_per_class=8)
    root = tmp_path / "input" / "SYNTH"
    splits = pickle.load(open(root / "vid_splits_SYNTH.pkl", "rb"))
    cls = pickle.load(open(root / "vid_class_SYNTH.pkl", "rb"))
    dmap = pickle.load(open(root / "data_map_SYNTH_keypoints.pkl", "rb"))

    ds = KeypointDataset(splits["train"], dmap, cls, build_eval_transform(32))
    loader = Loader(ds, batch_size=8, shuffle=True, num_workers=2)

    model = HWGATE(
        kp_dim=2, temporal_dim=32, num_classes=8, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
    )

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 1e-3

    state, opt = init_state(model, Cfg, (32, 64, 2), ("dropout",))
    tstep, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False)
    key = jax.random.PRNGKey(0)
    first_loss, last_loss, last_acc = None, None, 0.0
    for ep in range(40):
        loss, acc = train_epoch(tstep, state, loader, key, ep)
        first_loss = first_loss if first_loss is not None else loss
        last_loss, last_acc = loss, acc
    assert last_acc > 0.4, (first_loss, last_loss, last_acc)
    assert last_loss < 0.75 * first_loss, (first_loss, last_loss)


@pytest.mark.parametrize("stream", ["float32", "bfloat16"])
def test_hwgate_bf16_compute_learns(tmp_path, stream):
    """Mixed precision (compute_dtype=bfloat16) must fit the same synthetic
    task: catches precision bugs in the bf16 matmul/attention path — and in
    the bf16 RESIDUAL-STREAM fast path (stream_dtype=bfloat16)."""
    import jax

    from sl_hwgat_tpu.configs import build_eval_transform
    from sl_hwgat_tpu.data.dataset import KeypointDataset, Loader
    from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset
    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.loop import init_state, make_steps, train_epoch

    write_synthetic_dataset(str(tmp_path / "input"), num_classes=8, clips_per_class=8)
    root = tmp_path / "input" / "SYNTH"
    splits = pickle.load(open(root / "vid_splits_SYNTH.pkl", "rb"))
    cls = pickle.load(open(root / "vid_class_SYNTH.pkl", "rb"))
    dmap = pickle.load(open(root / "data_map_SYNTH_keypoints.pkl", "rb"))

    ds = KeypointDataset(splits["train"], dmap, cls, build_eval_transform(32))
    loader = Loader(ds, batch_size=8, shuffle=True, num_workers=2)

    model = HWGATE(
        kp_dim=2, temporal_dim=32, num_classes=8, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        compute_dtype="bfloat16", stream_dtype=stream,
    )

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 1e-3

    state, opt = init_state(model, Cfg, (32, 64, 2), ("dropout",))
    # params must stay f32 despite bf16 compute
    assert all(p.dtype == jax.numpy.float32
               for p in jax.tree.leaves(state.variables["params"]))
    tstep, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False)
    key = jax.random.PRNGKey(0)
    first_loss, last_loss, last_acc = None, None, 0.0
    for ep in range(40):
        loss, acc = train_epoch(tstep, state, loader, key, ep)
        first_loss = first_loss if first_loss is not None else loss
        last_loss, last_acc = loss, acc
    assert last_acc > 0.4, (first_loss, last_loss, last_acc)
    assert last_loss < 0.75 * first_loss, (first_loss, last_loss)
