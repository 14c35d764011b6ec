"""Label-smoothed cross-entropy. ≡ reference `hwgat/losses/SmoothCrossEntropy.py:8-39`.

loss = (1 - s)·NLL(target) + s·mean(-log p), s = 0.01 by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothed_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                           smooth_factor: float = 0.01) -> jnp.ndarray:
    """logits (N, C), integer targets (N,) → scalar mean loss."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(log_probs, axis=-1)
    return jnp.mean((1.0 - smooth_factor) * nll + smooth_factor * smooth)


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(log_probs, targets[:, None], axis=-1))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


CRITERIA = {
    "smooth_cross_entropy": smoothed_cross_entropy,
    "cross_entropy": cross_entropy,
    "mse": mse,
}
