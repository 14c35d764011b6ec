"""Train state and optimizer/scheduler factories.

≡ reference `hwgat/utils.py:62-91`: AdamW/Adam/NAdam/SGD with torch-default
hyperparameters, cosine-annealing LR with T_max=20 stepped once per epoch
(closed form, matching ``torch.optim.lr_scheduler.CosineAnnealingLR``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np
import optax


def cosine_annealing_lr(epoch: int | jax.Array, base_lr: float, t_max: int = 20,
                        eta_min: float = 0.0):
    """lr(e) = η_min + (lr₀ − η_min)·(1 + cos(π·e/T_max))/2 — the closed form
    of torch CosineAnnealingLR (periodic beyond T_max)."""
    import jax.numpy as jnp

    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * epoch / t_max)) / 2


def make_optimizer(optimizer_type: str, lr: float) -> optax.GradientTransformation:
    """torch-default hyperparameters (`utils.py:73-84`)."""
    if optimizer_type == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        )
    elif optimizer_type == "adam":
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    elif optimizer_type == "nadam":
        opt = optax.inject_hyperparams(optax.nadam)(learning_rate=lr)
    elif optimizer_type == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer: {optimizer_type}")
    return opt


def set_lr(opt_state, lr):
    """Update the injected learning rate (scheduler step)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


@dataclass
class TrainState:
    """Device-side training state + host-side bookkeeping.

    ``variables``: full flax variable dict (params + buffers/batch_stats).
    ``history``: the four curves the reference checkpoints
    (`utils.py:164-176`).
    """

    variables: dict
    opt_state: Any
    epoch: int = 0
    base_lr: float = 5e-4
    history: dict = field(
        default_factory=lambda: {
            "train_loss": [], "val_loss": [], "train_acc": [], "val_acc": [],
        }
    )

    @property
    def params(self):
        return self.variables["params"]

    def to_numpy(self):
        return jax.tree.map(np.asarray, (self.variables, self.opt_state))
