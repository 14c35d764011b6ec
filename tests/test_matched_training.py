"""Matched-training head-to-head vs the reference torch stack.

The strongest accuracy evidence obtainable without the real FDMSE-ISL data
(VERDICT r1 item 2): train the reference torch HWGATE and our Flax HWGATE
from IDENTICAL initial weights on an IDENTICAL synthetic dataset with the
reference regime — AdamW(5e-4, torch-default wd 0.01), CosineAnnealingLR
T_max=20 stepped per epoch, SmoothedCrossEntropyLoss(0.01), same batch
order — and assert the per-epoch loss trajectories track and the final
accuracies match.

Determinism: the reference's train-time attention prune
(`hwgat/models/HWGATE.py:93-100`) draws from the global torch RNG and cannot
be seed-matched across frameworks, so the torch model runs in ``eval()`` mode
(prune + dropout off; gradients still flow) and ours runs with
``drop_rate=0, prune_attn=False`` — numerically the same computation, so any
trajectory drift isolates optimizer/loss/schedule differences.

≡ reference `hwgat/utils.py:93-142` (train/evaluate) and `:240-290` (epoch
driver). Slow (~2-4 min CPU); opt in with RUN_SLOW=1.
"""

import os

import numpy as np
import pytest

from tests.conftest import import_reference

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("RUN_SLOW") != "1", reason="slow; set RUN_SLOW=1"),
]

N_CLS, SRC_LEN, N_KP, KP_DIM = 5, 16, 64, 2
N_SAMPLES, BATCH, EPOCHS, LR = 40, 4, 6, 5e-4


def _synthetic_task(rng):
    """Learnable task: class-specific keypoint mean offsets + noise."""
    y = np.arange(N_SAMPLES) % N_CLS
    proto = rng.normal(size=(N_CLS, 1, N_KP, KP_DIM)).astype(np.float32)
    x = proto[y] + 0.3 * rng.normal(
        size=(N_SAMPLES, SRC_LEN, N_KP, KP_DIM)).astype(np.float32)
    return x, y.astype(np.int64)


def _batch_schedule(rng):
    """Fixed per-epoch batch order shared by both frameworks."""
    return [rng.permutation(N_SAMPLES).reshape(-1, BATCH) for _ in range(EPOCHS)]


def _train_torch(x, y, schedule):
    import torch

    params_mod = import_reference("models.model_params")
    hw = import_reference("models.HWGATE")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    torch.manual_seed(0)
    p = params_mod.HWGATEParams({"num_class": N_CLS, "src_len": SRC_LEN}, KP_DIM,
                                device=None)
    p.drop_rate = 0.0
    model = hw.Model(*p.get_model_params())
    model.eval()  # prune/dropout off; grads still flow (see module docstring)

    init_sd = {k: v.detach().clone().numpy() for k, v in model.state_dict().items()}

    opt = torch.optim.AdamW(model.parameters(), lr=LR)  # ≡ utils.py:74
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    crit = losses_mod.SmoothedCrossEntropyLoss()

    xt, yt = torch.tensor(x), torch.tensor(y)
    traj = []
    for ep in range(EPOCHS):
        total = 0.0
        for idx in schedule[ep]:
            out = model(xt[idx])
            loss = crit(out, yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        traj.append(total / len(schedule[ep]))
    with torch.no_grad():
        acc = float((model(xt).argmax(-1) == yt).float().mean())
    return traj, acc, init_sd


def _train_ours(x, y, schedule, init_state_dict):
    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)
    from sl_hwgat_tpu.train.torch_import import hwgate_from_torch

    model = HWGATE(kp_dim=KP_DIM, temporal_dim=SRC_LEN, num_classes=N_CLS,
                   drop_rate=0.0, prune_attn=False)
    variables = jax.tree.map(jnp.asarray, hwgate_from_torch(init_state_dict))
    optimizer = make_optimizer("adamw", LR)
    opt_state = optimizer.init(variables["params"])
    tstep, _ = make_steps(model, optimizer, donate=False)

    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    key = jax.random.PRNGKey(0)
    valid = jnp.ones((BATCH,), jnp.float32)
    traj = []
    for ep in range(EPOCHS):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, LR))
        total = 0.0
        for step, idx in enumerate(schedule[ep]):
            variables, opt_state, loss, _, _ = tstep(
                variables, opt_state, xj[idx], yj[idx], valid, key, ep, step)
            total += float(loss)
        traj.append(total / len(schedule[ep]))
    logits = model.apply(variables, xj, train=False)
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == y))
    return traj, acc


def test_matched_training_trajectories_track_reference():
    rng = np.random.default_rng(7)
    x, y = _synthetic_task(rng)
    schedule = _batch_schedule(np.random.default_rng(11))

    ref_traj, ref_acc, init_sd = _train_torch(x, y, schedule)
    our_traj, our_acc = _train_ours(x, y, schedule, init_sd)

    print(f"\nmatched-training: torch={ref_traj}\n          ours={our_traj}\n"
          f"acc torch={ref_acc:.3f} ours={our_acc:.3f}")
    # loss must go down for both (the task is learnable)
    assert ref_traj[-1] < 0.9 * ref_traj[0]
    assert our_traj[-1] < 0.9 * our_traj[0]
    # trajectories track: measured agreement is ~1e-7 relative at every epoch
    # (recorded in COVERAGE.md); the tolerances below leave headroom for
    # platform-dependent f32 accumulation order only.
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=1e-3)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=0.02)
    # final train-set accuracy matches (measured: identical, 0.500 both)
    assert abs(our_acc - ref_acc) <= 0.05, (our_acc, ref_acc)


def test_matched_training_gate_banded_family():
    """Second anchor, banded family: GATE (whole-body 29-joint graph, banded
    attention, weightedAvg pooling) trained head-to-head vs the reference
    torch GATE — same init/data/regime. Covers the additive-mask attention
    path and the learned pooling the HWGATE test doesn't touch."""
    import torch

    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.gate import GATE
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)
    from sl_hwgat_tpu.train.torch_import import gat_family_from_torch

    params_mod = import_reference("models.model_params")
    gate_mod = import_reference("models.GATE")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    n_samples, batch, epochs = 20, 4, 4
    rng = np.random.default_rng(5)
    y = (np.arange(n_samples) % N_CLS).astype(np.int64)
    proto = rng.normal(size=(N_CLS, 1, 29, KP_DIM)).astype(np.float32)
    x = proto[y] + 0.3 * rng.normal(
        size=(n_samples, SRC_LEN, 29, KP_DIM)).astype(np.float32)
    schedule = [np.random.default_rng(13 + e).permutation(n_samples)
                .reshape(-1, batch) for e in range(epochs)]

    torch.manual_seed(0)
    p = params_mod.GATEParams({"num_class": N_CLS, "src_len": SRC_LEN}, KP_DIM,
                              device=None)
    p.drop_rate = 0.0
    p.embed_dim, p.depths, p.num_heads = 64, 4, 4  # CPU-sized, same both sides
    tmodel = gate_mod.Model(*p.get_model_params())
    tmodel.eval()
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    crit = losses_mod.SmoothedCrossEntropyLoss()
    xt, yt = torch.tensor(x), torch.tensor(y)
    ref_traj = []
    for ep in range(epochs):
        total = 0.0
        for idx in schedule[ep]:
            loss = crit(tmodel(xt[idx]), yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        ref_traj.append(total / len(schedule[ep]))

    ours = GATE(kp_dim=KP_DIM, temporal_dim=SRC_LEN, num_classes=N_CLS,
                embed_dim=64, depths=4, num_heads=4, drop_rate=0.0)
    variables = jax.tree.map(jnp.asarray, gat_family_from_torch(init_sd))
    optimizer = make_optimizer("adamw", LR)
    opt_state = optimizer.init(variables["params"])
    tstep, _ = make_steps(ours, optimizer, donate=False)
    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)
    our_traj = []
    for ep in range(epochs):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, LR))
        total = 0.0
        for step, idx in enumerate(schedule[ep]):
            variables, opt_state, loss, _, _ = tstep(
                variables, opt_state, xj[idx], yj[idx], valid, key, ep, step)
            total += float(loss)
        our_traj.append(total / len(schedule[ep]))

    print(f"\nGATE matched-training: torch={ref_traj}\n          ours={our_traj}")
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=1e-3)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=0.02)


def test_matched_training_stgcn_batchnorm_family():
    """Third anchor, BatchNorm family: STGCN trained in FULL TRAIN MODE both
    sides (batch-stat normalization + running-stat updates + edge-importance
    weighting) — validates the BN train-time semantics (momentum, biased/
    unbiased variance, stat chaining) that eval-mode parity can't see.
    Dropout is the only stochastic piece; set to 0."""
    import torch

    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
    from sl_hwgat_tpu.models.stgcn import STGCN
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)
    from sl_hwgat_tpu.train.torch_import import stgcn_from_torch

    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.STGCN")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    # lr 1e-4 (not the regime 5e-4): at 5e-4 this synthetic task is
    # optimization-chaotic (loss 13→4→7) and f32 noise amplifies beyond any
    # meaningful tolerance; the comparison needs a stable trajectory.
    lr = 1e-4
    n_samples, batch, epochs = 16, 4, 3
    rng = np.random.default_rng(17)
    y = (np.arange(n_samples) % N_CLS).astype(np.int64)
    proto = rng.normal(size=(N_CLS, 1, 29, KP_DIM)).astype(np.float32)
    x = proto[y] + 0.3 * rng.normal(
        size=(n_samples, SRC_LEN, 29, KP_DIM)).astype(np.float32)
    schedule = [np.random.default_rng(19 + e).permutation(n_samples)
                .reshape(-1, batch) for e in range(epochs)]

    torch.manual_seed(0)
    p = params_mod.STGCNParams({"num_class": N_CLS, "src_len": SRC_LEN}, KP_DIM,
                               device=None)
    p.dropout_ratio = 0.0
    tmodel = ref_mod.Model(*p.get_model_params())
    tmodel.train()  # full BN train semantics; dropout_ratio=0 → deterministic
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    crit = losses_mod.SmoothedCrossEntropyLoss()
    xt, yt = torch.tensor(x), torch.tensor(y)
    ref_traj = []
    for ep in range(epochs):
        total = 0.0
        for idx in schedule[ep]:
            loss = crit(tmodel(xt[idx]), yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        ref_traj.append(total / len(schedule[ep]))

    ours = STGCN(in_channels=KP_DIM, edges=BODY29_EDGES, num_classes=N_CLS,
                 dropout_ratio=0.0)
    variables = jax.tree.map(jnp.asarray, stgcn_from_torch(init_sd))
    optimizer = make_optimizer("adamw", lr)
    opt_state = optimizer.init(variables["params"])
    tstep, _ = make_steps(ours, optimizer, mutable_stats=True, donate=False)
    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)
    our_traj = []
    for ep in range(epochs):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, lr))
        total = 0.0
        for step, idx in enumerate(schedule[ep]):
            variables, opt_state, loss, _, _ = tstep(
                variables, opt_state, xj[idx], yj[idx], valid, key, ep, step)
            total += float(loss)
        our_traj.append(total / len(schedule[ep]))

    print(f"\nSTGCN matched-training: torch={ref_traj}\n          ours={our_traj}")
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=1e-3)
    # BN's rsqrt + the deep conv stack amplify f32 accumulation-order noise
    # faster than the attention models (measured ~2% by epoch 3 even at this
    # reduced lr); the BN-stat assert below is the exact-semantics check.
    np.testing.assert_allclose(our_traj, ref_traj, rtol=0.06)
    # running stats after training must also track torch's
    t_final = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ours_final = stgcn_from_torch(t_final)
    for k in ("batch_stats",):
        jax.tree.map(
            # abs tolerance: stats inherit the (documented) trajectory
            # noise; per-STEP update semantics are exact (see TorchBatchNorm)
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-2),
            variables[k], jax.tree.map(jnp.asarray, ours_final[k]))


def test_matched_training_transformer_family():
    """Fourth anchor: the Transformer baseline (torch nn.MultiheadAttention
    semantics, key-padding masks, LayerNorm placement) — completes the
    matched-training matrix over the four model families (windowed GAT,
    banded GAT, GCN/BatchNorm, Transformer)."""
    import torch

    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.models.transformer import TransformerClassifier
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)
    from sl_hwgat_tpu.train.torch_import import transformer_from_torch

    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.Transformer")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    n_samples, batch, epochs = 20, 4, 4
    rng = np.random.default_rng(23)
    y = (np.arange(n_samples) % N_CLS).astype(np.int64)
    proto = rng.normal(size=(N_CLS, 1, 29, KP_DIM)).astype(np.float32)
    x = proto[y] + 0.3 * rng.normal(
        size=(n_samples, SRC_LEN, 29, KP_DIM)).astype(np.float32)
    schedule = [np.random.default_rng(29 + e).permutation(n_samples)
                .reshape(-1, batch) for e in range(epochs)]

    torch.manual_seed(0)
    p = params_mod.TransformerParams({"num_class": N_CLS, "src_len": SRC_LEN},
                                     KP_DIM, device=None)
    p.drop_rate = 0.0
    tmodel = ref_mod.Model(*p.get_model_params())
    tmodel.eval()  # dropout off; grads still flow
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    crit = losses_mod.SmoothedCrossEntropyLoss()
    xt, yt = torch.tensor(x), torch.tensor(y)
    ref_traj = []
    for ep in range(epochs):
        total = 0.0
        for idx in schedule[ep]:
            loss = crit(tmodel(xt[idx]), yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        ref_traj.append(total / len(schedule[ep]))

    ours = TransformerClassifier(input_dim=29 * KP_DIM, num_classes=N_CLS,
                                 max_len=SRC_LEN, pool="mean", dropout=0.0)
    variables = jax.tree.map(jnp.asarray, transformer_from_torch(init_sd))
    optimizer = make_optimizer("adamw", LR)
    opt_state = optimizer.init(variables["params"])
    tstep, _ = make_steps(ours, optimizer, donate=False)
    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)
    our_traj = []
    for ep in range(epochs):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, LR))
        total = 0.0
        for step, idx in enumerate(schedule[ep]):
            variables, opt_state, loss, _, _ = tstep(
                variables, opt_state, xj[idx], yj[idx], valid, key, ep, step)
            total += float(loss)
        our_traj.append(total / len(schedule[ep]))

    print(f"\nTransformer matched-training: torch={ref_traj}\n"
          f"          ours={our_traj}")
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=1e-3)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=0.02)


def test_matched_training_decoupled_gcn_family():
    """Fifth anchor: DecoupledGCN — decoupled (grouped) adjacency gradients
    and the S/T/C attention modules, trained head-to-head in eval mode both
    sides (DropGraph draws from the global torch RNG and cannot be
    seed-matched; eval disables it while gradients still flow — BN then
    normalizes with running stats on both sides identically)."""
    import torch

    import jax
    import jax.numpy as jnp

    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
    from sl_hwgat_tpu.models.decoupled_gcn import DecoupledGCN
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)
    from sl_hwgat_tpu.train.torch_import import decoupled_gcn_from_torch

    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.DecoupledGCN")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    lr = 1e-4
    n_samples, batch, epochs = 12, 4, 2
    rng = np.random.default_rng(31)
    y = (np.arange(n_samples) % N_CLS).astype(np.int64)
    proto = rng.normal(size=(N_CLS, 1, 29, KP_DIM)).astype(np.float32)
    x = proto[y] + 0.3 * rng.normal(
        size=(n_samples, SRC_LEN, 29, KP_DIM)).astype(np.float32)
    schedule = [np.random.default_rng(37 + e).permutation(n_samples)
                .reshape(-1, batch) for e in range(epochs)]

    torch.manual_seed(0)
    p = params_mod.DecoupledGCNParams({"num_class": N_CLS, "src_len": SRC_LEN},
                                      KP_DIM, device=None)
    tmodel = ref_mod.Model(*p.get_model_params())
    tmodel.eval()  # DropGraph/dropout off; grads flow; BN uses running stats
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    crit = losses_mod.SmoothedCrossEntropyLoss()
    xt, yt = torch.tensor(x), torch.tensor(y)
    ref_traj = []
    for ep in range(epochs):
        total = 0.0
        for idx in schedule[ep]:
            loss = crit(tmodel(xt[idx]), yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        ref_traj.append(total / len(schedule[ep]))

    ours = DecoupledGCN(in_channels=KP_DIM, edges=BODY29_EDGES,
                        num_classes=N_CLS, dropout_ratio=0.0)
    variables = jax.tree.map(jnp.asarray, decoupled_gcn_from_torch(init_sd))
    optimizer = make_optimizer("adamw", lr)
    opt_state = optimizer.init(variables["params"])
    # train=False semantics on our side too: use the eval-mode apply inside a
    # custom step (BN running stats, no DropGraph), matching torch eval-mode
    # training exactly.
    from sl_hwgat_tpu.train.losses import smoothed_cross_entropy

    @jax.jit
    def estep(variables, opt_state, xb, yb):
        def loss_fn(params):
            logits = ours.apply({**variables, "params": params}, xb, train=False)
            return smoothed_cross_entropy(logits, yb)
        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        updates, opt_state = optimizer.update(grads, opt_state,
                                              variables["params"])
        params = jax.tree.map(lambda a, u: a + u, variables["params"], updates)
        return {**variables, "params": params}, opt_state, loss

    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    our_traj = []
    for ep in range(epochs):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, lr))
        total = 0.0
        for idx in schedule[ep]:
            variables, opt_state, loss = estep(variables, opt_state, xj[idx], yj[idx])
            total += float(loss)
        our_traj.append(total / len(schedule[ep]))

    print(f"\nDecoupledGCN matched-training: torch={ref_traj}\n"
          f"          ours={our_traj}")
    np.testing.assert_allclose(our_traj[0], ref_traj[0], rtol=2e-3)
    np.testing.assert_allclose(our_traj, ref_traj, rtol=0.02)
