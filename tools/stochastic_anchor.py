"""Stochastic-regularizer training equivalence anchor (VERDICT r2 item 4).

The matched-training anchors run with prune/dropout/DropGraph OFF because the
reference draws them from the global torch RNG (unmatchable across
frameworks). This experiment anchors the stochastic path STATISTICALLY:

For each of N seeds: build one torch-reference init (torch.manual_seed(seed)),
import the SAME weights into our Flax model, and train BOTH stacks on the
same data/batch schedule with their own native stochastic-regularizer draws —
  * HWGATE: train-time attention prune (`hwgat/models/HWGATE.py:94-100`) +
    dropout, reference in ``.train()`` mode vs ours with
    ``prune_attn=True, drop_rate>0`` under PRNG streams;
  * DecoupledGCN: DropGraph spatial+temporal (`DecoupledGCN.py:29-82`,
    keep_prob 0.9) active in both.
Weight init is paired, so the ONLY cross-framework difference is the
realization of the stochastic regularizers. The per-stack samples of final-epoch
mean train loss (continuous — ties-free) and final train accuracy are
compared with a two-sided Mann-Whitney U test: equivalence holds when the
distributions are statistically indistinguishable.

Run:  python tools/stochastic_anchor.py [hwgate|dgcn] [n_seeds] [epochs]
Writes tools/stochastic_anchor_<family>.json and prints the table that goes
into COVERAGE.md. The opt-in test wrapper is
tests/test_stochastic_anchor.py (RUN_STAT=1).
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")

import numpy as np
import torch  # noqa: E402  (before jax: OpenMP deadlock otherwise)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tests.conftest import import_reference  # noqa: E402

N_CLS, KP_DIM = 5, 2
LR = 2e-3  # hotter than the reference regime so 20 epochs of stochastic draws actually move the loss


def synthetic_task(rng, n_train, n_test, src_len, n_kp, noise):
    y = np.arange(n_train + n_test) % N_CLS
    proto = rng.normal(size=(N_CLS, 1, n_kp, KP_DIM)).astype(np.float32)
    x = proto[y] + noise * rng.normal(
        size=(n_train + n_test, src_len, n_kp, KP_DIM)).astype(np.float32)
    y = y.astype(np.int64)
    return (x[:n_train], y[:n_train]), (x[n_train:], y[n_train:])


def batch_schedule(rng, n, batch, epochs):
    return [rng.permutation(n).reshape(-1, batch) for _ in range(epochs)]


def _train_torch(model, crit, xt, yt, xe, ye, schedule, epochs):
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=20)
    final = 0.0
    for ep in range(epochs):
        total = 0.0
        for idx in schedule[ep]:
            loss = crit(model(xt[idx]), yt[idx])
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += loss.item()
        sched.step()
        final = total / len(schedule[ep])
    model.eval()
    with torch.no_grad():
        pred = model(xt).argmax(-1).numpy()
    # final-epoch mean train loss (continuous — the MW statistic) + train acc
    return final, float(np.mean(pred == yt.numpy()))


def _train_ours(model, variables, rng_streams, x, y, xe, ye, schedule, epochs,
                seed, mutable_stats=False):
    from sl_hwgat_tpu.train.loop import make_steps
    from sl_hwgat_tpu.train.state import (cosine_annealing_lr, make_optimizer,
                                          set_lr)

    optimizer = make_optimizer("adamw", LR)
    opt_state = optimizer.init(variables["params"])
    tstep, _ = make_steps(model, optimizer, rng_streams=rng_streams,
                          mutable_stats=mutable_stats, donate=False)
    xj, yj = jnp.asarray(x), jnp.asarray(y.astype(np.int32))
    key = jax.random.PRNGKey(1000 + seed)
    valid = jnp.ones((schedule[0].shape[1],), jnp.float32)
    final = 0.0
    for ep in range(epochs):
        opt_state = set_lr(opt_state, cosine_annealing_lr(ep, LR))
        total = 0.0
        for step, idx in enumerate(schedule[ep]):
            variables, opt_state, loss, _, _ = tstep(
                variables, opt_state, xj[idx], yj[idx], valid, key, ep, step)
            total += float(loss)
        final = total / len(schedule[ep])
    logits = model.apply(variables, xj, train=False)
    return final, float(np.mean(np.argmax(np.asarray(logits), -1) == y))


def run_hwgate(seed, data, schedule, epochs):
    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.train.torch_import import hwgate_from_torch

    (x, y), (xe, ye) = data
    src_len = x.shape[1]
    params_mod = import_reference("models.model_params")
    hw = import_reference("models.HWGATE")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    torch.manual_seed(seed)
    p = params_mod.HWGATEParams({"num_class": N_CLS, "src_len": src_len},
                                KP_DIM, device=None)
    p.embed_dim, p.depths, p.num_heads = 32, [1, 1], [2, 2]  # CPU-sized
    p.drop_rate = 0.1
    tmodel = hw.Model(*p.get_model_params())
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    acc_t = _train_torch(
        tmodel, losses_mod.SmoothedCrossEntropyLoss(),
        torch.tensor(x), torch.tensor(y), torch.tensor(xe), torch.tensor(ye),
        schedule, epochs)

    ours = HWGATE(kp_dim=KP_DIM, temporal_dim=src_len, num_classes=N_CLS,
                  embed_dim=32, depths=(1, 1), num_heads=(2, 2),
                  drop_rate=0.1, prune_attn=True)
    variables = jax.tree.map(jnp.asarray, hwgate_from_torch(init_sd))
    acc_o = _train_ours(ours, variables, ("dropout", "prune"), x, y, xe, ye,
                        schedule, epochs, seed)
    return acc_t, acc_o


def run_dgcn(seed, data, schedule, epochs):
    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
    from sl_hwgat_tpu.models.decoupled_gcn import DecoupledGCN
    from sl_hwgat_tpu.train.torch_import import decoupled_gcn_from_torch

    (x, y), (xe, ye) = data
    params_mod = import_reference("models.model_params")
    ref_mod = import_reference("models.DecoupledGCN")
    losses_mod = import_reference("losses.SmoothCrossEntropy")

    torch.manual_seed(seed)
    p = params_mod.DecoupledGCNParams({"num_class": N_CLS, "src_len": x.shape[1]},
                                      KP_DIM, device=None)
    tmodel = ref_mod.Model(*p.get_model_params())
    init_sd = {k: v.detach().clone().numpy() for k, v in tmodel.state_dict().items()}

    acc_t = _train_torch(
        tmodel, losses_mod.SmoothedCrossEntropyLoss(),
        torch.tensor(x), torch.tensor(y), torch.tensor(xe), torch.tensor(ye),
        schedule, epochs)

    ours = DecoupledGCN(in_channels=KP_DIM, edges=BODY29_EDGES,
                        num_classes=N_CLS)
    variables = jax.tree.map(jnp.asarray, decoupled_gcn_from_torch(init_sd))
    acc_o = _train_ours(ours, variables, ("dropout", "dropgraph"), x, y,
                        xe, ye, schedule, epochs, seed, mutable_stats=True)
    return acc_t, acc_o


def mann_whitney_u(a, b):
    """Two-sided Mann-Whitney U p-value (normal approximation with tie
    correction — scipy-free so the anchor has no extra deps)."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    n1, n2 = len(a), len(b)
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    r1 = ranks[:n1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    # tie correction
    _, counts = np.unique(allv, return_counts=True)
    tie = ((counts ** 3 - counts).sum()) / ((n1 + n2) * (n1 + n2 - 1))
    var = n1 * n2 / 12.0 * ((n1 + n2 + 1) - tie)
    if var <= 0:
        return 1.0  # all values identical → indistinguishable
    z = (u1 - mu - np.sign(u1 - mu) * 0.5) / np.sqrt(var)
    from math import erf
    return float(2 * (1 - 0.5 * (1 + erf(abs(z) / np.sqrt(2)))))


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "hwgate"
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    rng = np.random.default_rng(7)
    if family == "hwgate":
        data = synthetic_task(rng, 40, 40, src_len=16, n_kp=64, noise=0.3)
        runner = run_hwgate
    elif family == "dgcn":
        data = synthetic_task(rng, 24, 24, src_len=16, n_kp=29, noise=0.3)
        runner = run_dgcn
    else:
        raise SystemExit(f"unknown family {family}")
    schedule = batch_schedule(np.random.default_rng(11), len(data[0][1]), 4, epochs)

    loss_torch, loss_ours, acc_torch, acc_ours = [], [], [], []
    for seed in range(n_seeds):
        (lt, at), (lo, ao) = runner(seed, data, schedule, epochs)
        loss_torch.append(lt)
        loss_ours.append(lo)
        acc_torch.append(at)
        acc_ours.append(ao)
        print(f"[{family}] seed {seed}: torch loss {lt:.4f} acc {at:.3f} | "
              f"ours loss {lo:.4f} acc {ao:.3f}", flush=True)

    p = mann_whitney_u(loss_torch, loss_ours)
    p_acc = mann_whitney_u(acc_torch, acc_ours)
    rec = {
        "family": family, "n_seeds": n_seeds, "epochs": epochs,
        "loss_torch": loss_torch, "loss_ours": loss_ours,
        "acc_torch": acc_torch, "acc_ours": acc_ours,
        "mean_loss_torch": float(np.mean(loss_torch)),
        "mean_loss_ours": float(np.mean(loss_ours)),
        "std_loss_torch": float(np.std(loss_torch)),
        "std_loss_ours": float(np.std(loss_ours)),
        "mean_acc_torch": float(np.mean(acc_torch)),
        "mean_acc_ours": float(np.mean(acc_ours)),
        "mann_whitney_p_loss": p,
        "mann_whitney_p_acc": p_acc,
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"stochastic_anchor_{family}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
