"""End-to-end: synthetic dataset → train → checkpoint → resume → transfer →
final eval + confusion CSV. Locks the CLI contract (SURVEY.md §4.4)."""

import os

import numpy as np
import pytest

from sl_hwgat_tpu.configs import RunConfig
from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset

pytestmark = pytest.mark.slow  # heavy tier: run with `pytest -m slow`


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    write_synthetic_dataset(str(root / "input"))
    return root


def small_cfg(workdir, mode="train", model="HWGATE", time="t0", weights="none", epochs=2):
    cfg = RunConfig(
        dataset="SYNTH",
        model_type=model,
        mode=mode,
        time=time,
        model_weights=weights,
        input_root=str(workdir / "input"),
        output_root=str(workdir / "output"),
    )
    cfg.epochs = epochs
    cfg.batch_size = 4
    cfg.n_workers = 2
    # tiny model for CPU speed
    if model == "HWGATE":
        cfg.overrides = dict(embed_dim=32, depths=(1, 1), num_heads=(2, 2))
    return cfg


def test_train_checkpoint_eval(workdir):
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir)
    results, state = run(cfg, progress=False)
    assert set(results) == {"train", "val", "test"}
    out = cfg.out_folder
    assert os.path.exists(f"{cfg.save_model_path}_best_loss.ckpt")
    assert os.path.exists(cfg.save_loss_curve_path)
    assert os.path.exists(cfg.save_cm_path)
    assert os.path.exists(os.path.join(out, "hwgate.py"))  # experiment snapshot
    assert len(state.history["train_loss"]) == 3  # epochs 0..2


def test_resume_continues_epochs(workdir):
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir, mode="load", time="t0", epochs=4)
    results, state = run(cfg, progress=False)
    # resumed from epoch 2's best checkpoint → history extended beyond 3
    assert len(state.history["train_loss"]) >= 4


def test_transfer_load_partial(workdir):
    """Finetune path: load weights from a prior run into a model with a new
    class head (shape-mismatched head keeps fresh init)."""
    from sl_hwgat_tpu.cli import run
    from sl_hwgat_tpu.train import checkpoint as ckpt_lib
    from sl_hwgat_tpu.train.loop import init_state
    from sl_hwgat_tpu.models import build_model

    prev = small_cfg(workdir, time="t0")
    src = f"{prev.save_model_path}_best_loss.ckpt"
    assert os.path.exists(src)

    cfg = small_cfg(workdir, time="t1")
    model = build_model(cfg.model_type, {"num_class": 7, "src_len": 32}, 2, **cfg.overrides)
    state, _ = init_state(model, cfg, (32, 64, 2), ("dropout", "prune"))
    head_before = np.asarray(state.variables["params"]["head"]["kernel"]).copy()
    body_before = np.asarray(
        state.variables["params"]["layers_0_blocks_0"]["attn"]["q"]["kernel"]
    ).copy()
    state = ckpt_lib.load_pretrained_into(state, src, cfg.model_type, verbose=False)
    # head kept fresh (shape mismatch: 16 vs 7 classes), body overwritten
    np.testing.assert_array_equal(state.variables["params"]["head"]["kernel"], head_before)
    assert not np.allclose(
        state.variables["params"]["layers_0_blocks_0"]["attn"]["q"]["kernel"], body_before
    )


def test_stgcn_cli_train(workdir):
    """29-joint skeleton path + BatchNorm batch_stats plumbing through the CLI."""
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir, model="STGCN", time="t2", epochs=1)
    cfg.overrides = dict(n_out_features=32)
    results, state = run(cfg, progress=False)
    assert "batch_stats" in state.variables
    stats = state.variables["batch_stats"]["data_bn"]["mean"]
    assert float(np.abs(np.asarray(stats)).sum()) > 0  # stats actually updated
    assert os.path.exists(f"{cfg.save_model_path}_best_loss.ckpt")


def test_gate_cli_train(workdir):
    """Banded-attention model through the CLI (29-joint, additive mask)."""
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir, model="GATE", time="t3", epochs=1)
    cfg.overrides = dict(embed_dim=32, depths=2, num_heads=2)
    results, state = run(cfg, progress=False)
    assert set(results) == {"train", "val", "test"}


def test_decoupled_gcn_cli_train(workdir):
    """DropGraph rng stream + BN through the CLI."""
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir, model="DecoupledGCN", time="t4", epochs=1)
    cfg.overrides = dict(n_out_features=32, groups=4)
    results, state = run(cfg, progress=False)
    assert set(results) == {"train", "val", "test"}


def test_transformer_cli_train(workdir):
    from sl_hwgat_tpu.cli import run

    cfg = small_cfg(workdir, model="Transformer", time="t5", epochs=1)
    cfg.overrides = dict(d_model=64, dim_feedforward=128, num_encoder_layers=1)
    results, state = run(cfg, progress=False)
    assert set(results) == {"train", "val", "test"}


def test_wgate_hgate_cli_train(workdir):
    """Remaining zoo members through the CLI: banded WGATE (64-kp windowed
    layout) and padded-supertile HGATE (29-kp skeleton layout)."""
    from sl_hwgat_tpu.cli import run

    for model, t, overrides in (
        ("WGATE", "t6", dict(embed_dim=32, depths=1, num_heads=2)),
        ("HGATE", "t7", dict(embed_dim=32, depths=(1, 1), num_heads=(2, 2))),
    ):
        cfg = small_cfg(workdir, model=model, time=t, epochs=1)
        cfg.overrides = overrides
        results, _ = run(cfg, progress=False)
        assert set(results) == {"train", "val", "test"}, model


def test_cosine_lr_matches_torch():
    torch = pytest.importorskip("torch")
    from sl_hwgat_tpu.train.state import cosine_annealing_lr

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.AdamW(m.parameters(), lr=5e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20, last_epoch=-1)
    for epoch in range(45):
        want = opt.param_groups[0]["lr"]
        got = float(cosine_annealing_lr(epoch, 5e-4, 20))
        np.testing.assert_allclose(got, want, atol=1e-9)
        sched.step()


def test_t_max_flag_gives_single_decay():
    """--t-max plumbs through the CLI parser, and t_max=epochs yields a
    MONOTONE schedule over the whole run — the large-vocab anchor regime
    (tools/largevocab_sweep_r05.md: the default periodic T_max-20 cosine
    rises again after each cycle and undoes the previous one)."""
    import sys
    from unittest import mock

    from sl_hwgat_tpu.cli import parser
    from sl_hwgat_tpu.train.state import cosine_annealing_lr

    argv = ["prog", "-d", "SYNTH", "-model", "HWGATE", "-m", "train",
            "--epochs", "80", "--lr", "3e-4", "--t-max", "80"]
    with mock.patch.object(sys, "argv", argv):
        args = parser()
    assert args.t_max == 80 and args.epochs == 80

    lrs = [float(cosine_annealing_lr(e, args.lr, args.t_max)) for e in range(81)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))  # single decay
    np.testing.assert_allclose(lrs[-1], 0.0, atol=1e-12)

    periodic = [float(cosine_annealing_lr(e, args.lr, 20)) for e in range(81)]
    assert any(a < b for a, b in zip(periodic, periodic[1:]))  # rises again


def test_grad_accum_matches_full_batch():
    """grad_accum=2 with deterministic (no-dropout/prune) model produces the
    same update as the full-batch step (mean-of-micro-grads == full-batch
    grad when microbatches are fully valid and equally sized)."""
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.loop import init_state, make_steps
    from sl_hwgat_tpu.train.state import make_optimizer

    model = HWGATE(kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
                   depths=(1, 1), num_heads=(2, 2), drop_rate=0.0,
                   prune_attn=False)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 1e-3

    state, opt = init_state(model, Cfg, (16, 64, 2), ("dropout",))
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(8, 16, 64, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 6, size=(8,)).astype(np.int32))
    valid = jnp.ones(8, jnp.float32)
    key = jax.random.PRNGKey(0)

    full, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False)
    accum, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False,
                          grad_accum=2)
    v1, o1, loss1, c1, n1 = full(state.variables, state.opt_state, x, y, valid, key, 0, 0)
    v2, o2, loss2, c2, n2 = accum(state.variables, state.opt_state, x, y, valid, key, 0, 0)
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(float(c1), float(c2))
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        v1["params"], v2["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_grad_accum_matches_full_batch_with_padding():
    """Padded batches (valid=0 tail): accumulation must normalize by the
    GLOBAL valid count, matching the full-batch weighted loss exactly even
    when some microbatches are partially or fully padding."""
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.loop import init_state, make_steps

    model = HWGATE(kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
                   depths=(1, 1), num_heads=(2, 2), drop_rate=0.0,
                   prune_attn=False)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 1e-3

    state, opt = init_state(model, Cfg, (16, 64, 2), ("dropout",))
    r = np.random.default_rng(1)
    x = jnp.asarray(r.normal(size=(8, 16, 64, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 6, size=(8,)).astype(np.int32))
    # only 3 valid samples: microbatch 1 has 1 valid, microbatches 2-3 all pad
    valid = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)
    key = jax.random.PRNGKey(0)

    full, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False)
    accum, _ = make_steps(model, opt, rng_streams=("dropout",), donate=False,
                          grad_accum=4)
    v1, o1, loss1, c1, n1 = full(state.variables, state.opt_state, x, y, valid, key, 0, 0)
    v2, o2, loss2, c2, n2 = accum(state.variables, state.opt_state, x, y, valid, key, 0, 0)
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(float(n1), float(n2))
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        v1["params"], v2["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_grad_accum_with_batch_stats_chains_bn():
    """grad_accum on a BatchNorm model (STGCN): BN running stats chain through
    the microbatch scan exactly as sequential microbatches would, and the
    parameter update equals the accumulated-gradient update."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sl_hwgat_tpu.models.stgcn import stgcn_from_dataset
    from sl_hwgat_tpu.train.loop import init_state, make_steps
    from sl_hwgat_tpu.train.state import make_optimizer

    ds = {"num_class": 4, "src_len": 8}
    model = stgcn_from_dataset(ds, 2, dropout_ratio=0.0)

    class Cfg:
        seed = 0
        optimizer_type = "sgd"  # linear in grads: accumulation is exact
        lr = 1e-2

    state, optimizer = init_state(model, Cfg, (8, 29, 2), ("dropout",))
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(4, 8, 29, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 4, size=(4,)).astype(np.int32))
    valid = jnp.ones(4, jnp.float32)
    key = jax.random.PRNGKey(0)

    accum, _ = make_steps(model, optimizer, rng_streams=("dropout",),
                          mutable_stats=True, donate=False, grad_accum=2)
    va, _, loss_a, _, _ = accum(state.variables, state.opt_state, x, y, valid,
                                key, 0, 0)

    # manual sequential reference: chain stats through two half-batches,
    # average the two unnormalized grads, one SGD step
    plain, _ = make_steps(model, optimizer, rng_streams=("dropout",),
                          mutable_stats=True, donate=False)

    def grads_with(variables, xs, ys, vs, rng):
        def loss_fn(params):
            logits, cols = model.apply(
                {**{k: v for k, v in variables.items() if k != "params"},
                 "params": params},
                xs, train=True, rngs=rng, mutable=["batch_stats"])
            from sl_hwgat_tpu.train.losses import smoothed_cross_entropy
            per = jax.vmap(lambda lg, lb: smoothed_cross_entropy(lg[None], lb[None]))(
                logits, ys)
            return jnp.sum(per * vs), cols
        (l, cols), g = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        return g, cols, l

    folded = jax.random.fold_in(jax.random.fold_in(key, 0), 0)
    (k0,) = jax.random.split(folded, 1)
    r0 = {"dropout": jax.random.fold_in(k0, 0)}
    r1 = {"dropout": jax.random.fold_in(k0, 1)}
    g0, cols0, l0 = grads_with(state.variables, x[:2], y[:2], valid[:2], r0)
    v_mid = {**state.variables, **cols0}
    g1, cols1, l1 = grads_with(v_mid, x[2:], y[2:], valid[2:], r1)
    g = jax.tree.map(lambda a, b: (a + b) / 4.0, g0, g1)

    # BN stats must equal the sequentially-chained stats
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        va["batch_stats"], cols1["batch_stats"])
    # loss equals the valid-weighted mean over the full batch
    np.testing.assert_allclose(float(loss_a), float((l0 + l1) / 4.0), rtol=1e-6)
    # parameter update equals one SGD step with the accumulated gradient
    want_params = jax.tree.map(lambda p, gg: p - Cfg.lr * gg,
                               state.variables["params"], g)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        va["params"], want_params)
