"""jit'd train/eval steps and the epoch driver.

≡ reference `hwgat/utils.py:93-142` (per-batch SGD loop, top-k eval) and
`:240-290` (epoch driver with best-loss / best-acc / every-N checkpoints,
curve plots, early stopping). Steps are compiled once per (model, shape) and
reused across epochs; batches carry a validity mask so shapes never change.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from sl_hwgat_tpu.train import checkpoint as ckpt_lib
from sl_hwgat_tpu.train.losses import CRITERIA
from sl_hwgat_tpu.train.state import TrainState, cosine_annealing_lr, make_optimizer, set_lr


def make_steps(model, optimizer, criterion_type: str = "smooth_cross_entropy",
               rng_streams: tuple = ("dropout",), mutable_stats: bool = False,
               donate: bool = True, grad_accum: int = 1):
    """Build (train_step, eval_step) jitted closures for ``model``.

    ``grad_accum > 1``: the batch is split into that many microbatches and
    gradients accumulate through a ``lax.scan`` before ONE optimizer update —
    large effective batches at microbatch activation-memory cost (the
    TPU-native answer to HBM ceilings; each microbatch draws its own RNGs).
    """
    criterion = CRITERIA[criterion_type]

    def split_rngs(key, epoch, step):
        key = jax.random.fold_in(jax.random.fold_in(key, epoch), step)
        keys = jax.random.split(key, len(rng_streams))
        return dict(zip(rng_streams, keys))

    def weighted_loss(logits, labels, valid):
        per = jax.vmap(lambda lg, lb: criterion(lg[None], lb[None]))(logits, labels)
        return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    def sum_loss(logits, labels, valid):
        per = jax.vmap(lambda lg, lb: criterion(lg[None], lb[None]))(logits, labels)
        return jnp.sum(per * valid)

    def grads_and_metrics(variables, x, y, valid, rngs, normalize=True,
                          aux_override=None):
        aux_cols = (aux_override if aux_override is not None
                    else {k: v for k, v in variables.items() if k != "params"})

        def loss_fn(params):
            out = model.apply(
                {**aux_cols, "params": params}, x, train=True, rngs=rngs,
                mutable=["batch_stats"] if mutable_stats else False,
            )
            logits, new_cols = out if mutable_stats else (out, {})
            loss = (weighted_loss(logits, y, valid) if normalize
                    else sum_loss(logits, y, valid))
            return loss, (logits, new_cols)

        (loss, (logits, new_cols)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        correct = (jnp.argmax(logits, -1) == y).astype(jnp.float32) * valid
        return grads, new_cols, loss, jnp.sum(correct), jnp.sum(valid)

    def train_step(variables, opt_state, x, y, valid, key, epoch, step):
        rngs = split_rngs(key, epoch, step)
        if grad_accum > 1:
            b = x.shape[0]
            if b % grad_accum:
                raise ValueError(f"batch {b} not divisible by grad_accum {grad_accum}")
            m = b // grad_accum
            xs = x.reshape(grad_accum, m, *x.shape[1:])
            ys = y.reshape(grad_accum, m)
            vs = valid.reshape(grad_accum, m)

            # Accumulate UNNORMALIZED (valid-weighted sum) losses/grads and
            # divide once by the GLOBAL valid count — exactly the full-batch
            # weighted loss even when padding leaves microbatches partially
            # (or fully) invalid. Batch-stats models (STGCN/DecoupledGCN)
            # chain their BN running stats through the scan carry — the same
            # state evolution as running the microbatches sequentially.
            aux0 = {k: v for k, v in variables.items() if k != "params"}

            def micro(carry, inp):
                g_acc, loss_acc, corr_acc, seen_acc, aux = carry
                xm, ym, vm, i = inp
                rngs_m = {name: jax.random.fold_in(k, i) for name, k in rngs.items()}
                g, cols, loss, corr, seen = grads_and_metrics(
                    variables, xm, ym, vm, rngs_m, normalize=False,
                    aux_override=aux)
                new_aux = {**aux, **cols} if mutable_stats else aux
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    loss_acc + loss, corr_acc + corr, seen_acc + seen, new_aux,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, variables["params"])
            (g_sum, loss_sum, correct, seen, aux_out), _ = jax.lax.scan(
                micro, (zeros, 0.0, 0.0, 0.0, aux0),
                (xs, ys, vs, jnp.arange(grad_accum)),
            )
            denom = jnp.maximum(seen, 1.0)
            grads = jax.tree.map(lambda g: g / denom, g_sum)
            loss = loss_sum / denom
            new_cols = {k: aux_out[k] for k in ("batch_stats",)
                        if mutable_stats and k in aux_out}
        else:
            grads, new_cols, loss, correct, seen = grads_and_metrics(
                variables, x, y, valid, rngs
            )
        updates, opt_state = optimizer.update(grads, opt_state, variables["params"])
        params = jax.tree.map(lambda p, u: p + u, variables["params"], updates)
        new_vars = {**variables, "params": params, **new_cols}
        return new_vars, opt_state, loss, correct, seen

    def eval_step(variables, x, y, valid, k):
        logits = model.apply(variables, x, train=False)
        loss = weighted_loss(logits, y, valid)
        # top-k via sorted logits (≡ argsort path, `utils.py:133-134`)
        topk = jnp.argsort(logits, axis=-1)[:, ::-1][:, :k]
        correct = jnp.any(topk == y[:, None], axis=-1).astype(jnp.float32) * valid
        return loss, jnp.sum(correct), jnp.sum(valid), jnp.argmax(logits, -1)

    return (
        jax.jit(train_step, donate_argnums=(0, 1) if donate else ()),
        jax.jit(eval_step, static_argnums=(4,)),
    )


_PIPELINE_DEPTH = 2  # steps the host may run ahead of metric readback


def train_epoch(train_step, state: TrainState, loader, key, epoch: int):
    """One pass over the training loader. ≡ `utils.py:93-116`.

    Metrics are materialized ``_PIPELINE_DEPTH`` steps late: ``float(loss)``
    immediately after dispatch would block the host on the device every step,
    serializing batch assembly/transfer with compute. The bounded window
    keeps host work overlapped with the device while capping queued buffers.
    """
    from collections import deque

    total_loss, correct, seen, batches = 0.0, 0.0, 0.0, 0
    variables, opt_state = state.variables, state.opt_state
    pending: deque = deque()

    def drain_one():
        nonlocal total_loss, correct, seen, batches
        loss, c, v = pending.popleft()
        total_loss += float(loss)
        correct += float(c)
        seen += float(v)
        batches += 1

    for step, (x, y, valid) in enumerate(loader.epoch(epoch)):
        variables, opt_state, loss, c, v = train_step(
            variables, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid),
            key, epoch, step,
        )
        pending.append((loss, c, v))
        if len(pending) > _PIPELINE_DEPTH:
            drain_one()
    while pending:
        drain_one()
    state.variables, state.opt_state = variables, opt_state
    return total_loss / max(batches, 1), correct / max(seen, 1.0)


def evaluate(eval_step, state: TrainState, loader, k: int = 1, epoch: int = 0):
    """Top-k evaluation. ≡ `utils.py:118-142`. Same bounded readback window
    as ``train_epoch``."""
    from collections import deque

    total_loss, correct, seen, batches = 0.0, 0.0, 0.0, 0
    pending: deque = deque()

    def drain_one():
        nonlocal total_loss, correct, seen, batches
        loss, c, v = pending.popleft()
        total_loss += float(loss)
        correct += float(c)
        seen += float(v)
        batches += 1

    for x, y, valid in loader.epoch(epoch):
        loss, c, v, _ = eval_step(
            state.variables, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), k
        )
        pending.append((loss, c, v))
        if len(pending) > _PIPELINE_DEPTH:
            drain_one()
    while pending:
        drain_one()
    return total_loss / max(batches, 1), correct / max(seen, 1.0)


def predictions_plus_true(eval_step, state: TrainState, loader):
    """(y_pred, y_true) over a loader. ≡ `utils.py:144-161`."""
    y_pred, y_true = [], []
    for x, y, valid in loader.epoch(0):
        _, _, _, pred = eval_step(
            state.variables, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), 1
        )
        nvalid = int(np.sum(valid))
        y_pred += np.asarray(pred)[:nvalid].tolist()
        y_true += np.asarray(y)[:nvalid].tolist()
    return y_pred, y_true


class EarlyStopper:
    """≡ `utils.py:353-368`."""

    def __init__(self, patience=1, min_delta=0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.max_validation_acc = 0.0

    def early_stop(self, validation_acc):
        if validation_acc > self.max_validation_acc:
            self.max_validation_acc = validation_acc
            self.counter = 0
        elif validation_acc < (self.max_validation_acc + self.min_delta):
            self.counter += 1
            if self.counter >= self.patience:
                return True
        return False


def run_epochs(model, cfg, state: TrainState, train_step, eval_step,
               train_loader, val_loader, early_stopper: EarlyStopper | None = None,
               progress: Callable[[int, dict], None] | None = None,
               plot: bool = True):
    """Epoch driver with the reference's three checkpoint triggers.
    ≡ `utils.py:240-290`."""
    from sl_hwgat_tpu.train.reporting import plot_results

    hist = state.history
    best_val_loss = min(hist["val_loss"], default=9999.0)
    best_val_acc = max(hist["val_acc"], default=0.0)
    key = jax.random.PRNGKey(cfg.seed)

    for epoch in range(state.epoch, cfg.epochs + 1):
        state.opt_state = set_lr(
            state.opt_state,
            cosine_annealing_lr(epoch, cfg.lr, cfg.scheduler_t_max)
            if cfg.scheduler == "CosineAnnealingLR"
            else cfg.lr,
        )
        train_loss, train_acc = train_epoch(train_step, state, train_loader, key, epoch)
        val_loss, val_acc = evaluate(eval_step, state, val_loader, epoch=epoch)

        hist["train_loss"].append(train_loss)
        hist["train_acc"].append(train_acc)
        hist["val_loss"].append(val_loss)
        hist["val_acc"].append(val_acc)
        state.epoch = epoch

        backend = getattr(cfg, "ckpt_backend", "pickle")
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            ckpt_lib.save_checkpoint(f"{cfg.save_model_path}_best_loss.ckpt", state,
                                     cfg.lr, backend=backend)
        if val_acc > best_val_acc:
            best_val_acc = val_acc
            ckpt_lib.save_checkpoint(f"{cfg.save_model_path}_best_acc.ckpt", state,
                                     cfg.lr, backend=backend)
        if epoch > 0 and epoch % cfg.save_interval == 0:
            ckpt_lib.save_checkpoint(f"{cfg.save_model_path}_{epoch}.ckpt", state,
                                     cfg.lr, backend=backend)

        if progress is not None:
            progress(epoch, dict(train_loss=train_loss, train_acc=train_acc,
                                 val_loss=val_loss, val_acc=val_acc,
                                 best_val_loss=best_val_loss))
        if plot:
            plot_results(hist["train_loss"], hist["val_loss"], "loss",
                         cfg.criterion_type, cfg.save_loss_curve_path)
            plot_results(hist["train_acc"], hist["val_acc"], "acc",
                         "accuracy", cfg.save_acc_curve_path)
        if cfg.early_stopping and early_stopper is not None and early_stopper.early_stop(val_acc):
            break
    ckpt_lib.wait_until_finished()  # commit any in-flight async (orbax) save
    return state


def init_state(model, cfg, sample_shape, rng_streams=("dropout",)):
    """Initialize variables + optimizer state for a fresh run.

    ``model.init`` is jitted: the eager path issues hundreds of tiny device
    ops, which is pathological over the remote TPU relay (~200s for HWGATE vs
    <2s compiled)."""
    key = jax.random.PRNGKey(cfg.seed)
    x = jnp.zeros((1,) + tuple(sample_shape), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(key, x, train=False)
    variables = dict(variables)
    optimizer = make_optimizer(cfg.optimizer_type, cfg.lr)
    opt_state = optimizer.init(variables["params"])
    return TrainState(variables=variables, opt_state=opt_state, base_lr=cfg.lr), optimizer
