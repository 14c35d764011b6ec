"""Shared Flax modules for the attention model family.

Numerics parity notes (vs torch defaults used by the reference):
- LayerNorm epsilon is 1e-5 (torch default; flax default would be 1e-6).
- GELU is the exact erf form (torch ``nn.GELU()`` default; jax default is tanh
  approximation).
- Linear weights init trunc_normal(std=.02), biases zero
  (`HWGATE.py:333-340`); LayerNorm scale 1 / bias 0.
- The Fourier projection matrix ``B`` and the sinusoid PE table are
  non-trainable buffers (reference: ``nn.Parameter(requires_grad=False)`` /
  ``register_buffer``), stored in the ``buffers`` variable collection.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LN_EPS = 1e-5
DENSE_INIT = nn.initializers.truncated_normal(stddev=0.02 / 0.87962566103423978)
# flax truncated_normal rescales by default? No: jax.nn.initializers.truncated_normal
# truncates at ±2σ without variance correction; the /0.879... factor matches the
# torch/timm convention of specifying the *pre-truncation* std. Practically
# indistinguishable; init parity is statistical, not bitwise (SURVEY §7).


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class Dense(nn.Module):
    """nn.Dense with the family's default init."""

    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=DENSE_INIT,
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


def layer_norm(name: str):
    return nn.LayerNorm(epsilon=LN_EPS, name=name)


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) sin/cos table. ≡ `HWGATE.py:16-21`."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class FourierEmbed(nn.Module):
    """Gaussian Fourier feature embedding. ≡ `HWGATE.py:296-299, 343-345`.

    x (..., kp_dim) → [sin(2πxBᵀ), cos(2πxBᵀ)] (..., embed_dim) with
    B ~ N(0, 1)·scale, non-trainable.
    """

    embed_dim: int
    kp_dim: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        mapping = self.embed_dim // 2

        def init(key):
            return jax.random.normal(key, (mapping, self.kp_dim), jnp.float32) * self.scale

        b = self.variable("buffers", "B", init, self.make_rng("params") if self.is_initializing() else None)
        proj = (2.0 * jnp.pi * x) @ b.value.T
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PositionalEncoding(nn.Module):
    """Temporal sinusoid PE broadcast over joints + dropout. ≡ `HWGATE.py:8-28`."""

    d_model: int
    max_len: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pe = self.variable(
            "buffers", "pe", lambda *_: jnp.asarray(sinusoid_table(self.max_len, self.d_model)), None
        )
        t = x.shape[1]
        x = x + pe.value[None, :t, None, :]
        return nn.Dropout(self.drop_rate, deterministic=not train)(x)


class FeedForward(nn.Module):
    """fc1 → GELU → drop → fc2 → drop. ≡ `HWGATE.py:120-136`.

    ``compute_dtype``: matmul/activation dtype (params stay float32) — the
    mixed-precision fast path; the caller's residual add promotes back to f32.
    """

    hidden: int
    out: int
    drop_rate: float = 0.0
    act: Callable = gelu_exact
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.compute_dtype)
        x = nn.Dense(self.hidden, kernel_init=DENSE_INIT, dtype=dt, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.out, kernel_init=DENSE_INIT, dtype=dt, name="fc2")(x)
        return nn.Dropout(self.drop_rate, deterministic=not train)(x)
