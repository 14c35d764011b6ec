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
import os
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


class FastLayerNorm(nn.Module):
    """LayerNorm with f32-ACCUMULATED statistics over the raw (possibly bf16)
    stream — no materialized f32 copy of the input.

    Same math as ``nn.LayerNorm(use_fast_variance=True)`` (E[x²]−E[x]², torch
    parity eps 1e-5) and the same param names/shapes ("scale", "bias"), so
    checkpoints interchange freely. The difference is purely how XLA lowers
    it: flax promotes the input to f32 up front, and because that converted
    tensor feeds two reductions AND the normalize pass, XLA materializes it
    to HBM (measured 0.35–0.78 ms per LN at the flagship stage-0 working set,
    ~5.6 ms/step of convert_element_type + inflated f32 reduce/normalize
    passes — round-4 step profile). Here each reduction consumes the bf16
    stream directly with an f32 accumulator (``jnp.mean(dtype=f32)`` /
    square fused into the reduce), and the normalize pass re-reads the bf16
    input once — every HBM pass over the stream is half-width. bf16→f32 is
    exact, so the statistics are identical to flax's.
    """

    epsilon: float = LN_EPS
    # feature axis: -1 for the token-major stream, 0 for the feature-major
    # (d, …) stream regime — the (d,)-shaped params are identical either way,
    # so the two layouts share one checkpoint.
    axis: int = -1

    @nn.compact
    def __call__(self, x):
        d = x.shape[self.axis]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        mean = jnp.mean(x, axis=self.axis, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=self.axis,
                         keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        xn = x
        if os.environ.get("SL_HWGAT_LN_BARRIER") != "0":
            # Numerically an identity, but load-bearing: without it XLA CSEs
            # the stats' and the normalize pass's x.astype(f32) into ONE
            # conversion with two consumers and materializes the f32 copy of
            # the stream to HBM (0.2–0.8 ms per LN at flagship shapes). The
            # barrier gives the normalize pass its own read of the bf16
            # stream, so each astype fuses into its consumer. Measured:
            # 102.9 → 95.4 ms/step (train, b16 bf16 rbg, round-4 profile).
            xn = jax.lax.optimization_barrier(x)
        y = (xn.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.axis == -1:
            return y * scale + bias
        bshape = (d,) + (1,) * (x.ndim - 1)
        return y * scale.reshape(bshape) + bias.reshape(bshape)


class FastDropout(nn.Module):
    """Dropout drawing its mask from bfloat16 uniforms (16 random bits per
    element) instead of flax's float32 bernoulli (32 bits + f32 compare).

    Mask generation is pure HBM traffic — the flagship step spent ~8.4 ms on
    ``jit(_uniform)`` + ``lt`` over f32 mask-sized tensors (round-4 profile);
    halving the element width halves it. The keep probability is quantized
    to bf16 resolution (≤0.4% relative, e.g. keep=0.9 → P(keep)≈0.8984) —
    imperceptible against dropout's own stochasticity; the statistical
    training-equivalence anchors (COVERAGE.md) are insensitive to the RNG
    stream's exact distribution at this granularity.

    The bf16 draw is a TPU bandwidth optimization, so it is the default ON
    TPU ONLY (ADVICE r4): everywhere else (CPU tests, torch matched-training
    anchors) the exact ``nn.Dropout`` semantics apply. Overrides:
    ``SL_HWGAT_EXACT_DROPOUT=1`` forces nn.Dropout everywhere,
    ``SL_HWGAT_FAST_DROPOUT=1`` forces the bf16 path everywhere.
    """

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool | None = None):
        det = self.deterministic if deterministic is None else deterministic
        if det or self.rate == 0.0:
            return x
        fast = os.environ.get("SL_HWGAT_FAST_DROPOUT") == "1" or (
            os.environ.get("SL_HWGAT_EXACT_DROPOUT") != "1"
            and jax.default_backend() == "tpu")
        if not fast:
            return nn.Dropout(self.rate, deterministic=False)(x)
        keep = 1.0 - self.rate
        u = jax.random.uniform(self.make_rng("dropout"), x.shape, jnp.bfloat16)
        mask = u < jnp.asarray(keep, jnp.bfloat16)
        return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                         jnp.zeros_like(x))


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
    if os.environ.get("SL_HWGAT_EXACT_LN") == "1":
        return nn.LayerNorm(epsilon=LN_EPS, name=name)
    return FastLayerNorm(name=name)


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
        return FastDropout(self.drop_rate, deterministic=not train)(x)


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
        x = FastDropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.out, kernel_init=DENSE_INIT, dtype=dt, name="fc2")(x)
        return FastDropout(self.drop_rate, deterministic=not train)(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact train-mode semantics.

    flax's ``nn.BatchNorm`` updates the running variance with the BIASED
    batch variance; torch ``_BatchNorm`` uses the UNBIASED one (×n/(n−1),
    `torch/nn/modules/batchnorm.py`). Normalization itself uses the biased
    variance in both. This module reproduces torch exactly (validated by the
    STGCN matched-training test: running stats track to ~1e-6 per step).

    Feature axis is the LAST axis; param/stat names match ``nn.BatchNorm``
    ("scale"/"bias", batch_stats "mean"/"var") so `train/torch_import.py` and
    existing checkpoints are unaffected. ``momentum`` follows the FLAX
    convention (decay of the old value; torch momentum 0.1 ≡ 0.9 here).
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: bool = False
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        init_mean = lambda: jnp.zeros((feat,), jnp.float32)
        init_var = lambda: jnp.ones((feat,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", init_mean)
        ra_var = self.variable("batch_stats", "var", init_var)
        scale = self.param("scale", self.scale_init, (feat,))
        bias = self.param("bias", self.bias_init, (feat,))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            var = jnp.mean(jnp.square(x - mean), axes)
            if not self.is_initializing():
                n = x.size // feat
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var * bessel
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class TransposedDense(nn.Module):
    """Dense layer that EMITS its output feature-major: (…, n, din) →
    (features, …, n), computed as one dot_general with the kernel as lhs —
    no materialized transpose of the activation.

    Param tree (kernel (din, features), bias (features,)) is identical to
    ``nn.Dense`` with the same name, so checkpoints/imports are
    interchangeable and a runtime layout switch (PALLAS_ATTN_TRANSPOSED)
    does not change the parameter structure. Used by the transposed-score
    attention path (`ops/pallas_attention.py::_fwd_kernel_ts*`), whose
    streams want (U, dh, N) blocks.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = DENSE_INIT

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.astype(self.dtype)
        xx = x.astype(self.dtype)
        y = jax.lax.dot_general(
            k, xx, (((0,), (x.ndim - 1,)), ((), ())),
            preferred_element_type=self.dtype)
        bshape = (self.features,) + (1,) * (y.ndim - 1)
        return y + bias.astype(y.dtype).reshape(bshape)


class FeatureDense(nn.Module):
    """Dense over a FEATURE-MAJOR activation: (din, …) → (features, …), one
    dot_general contracting the leading axes of kernel and input (the dot_tt
    form — measured at full MXU rate in the round-2 layout probes). Param
    tree ≡ ``nn.Dense`` (kernel (din, features), bias (features,)), so the
    feature-major stream regime shares checkpoints with the token-major
    model."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = DENSE_INIT

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[0], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jax.lax.dot_general(
            kernel.astype(self.dtype), x.astype(self.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=self.dtype)
        bshape = (self.features,) + (1,) * (y.ndim - 1)
        return y + bias.astype(y.dtype).reshape(bshape)


class FeatureFeedForward(nn.Module):
    """``FeedForward`` on the feature-major (d, …) stream — same param tree
    (fc1/fc2 with nn.Dense kernels), same math, zero layout crossings."""

    hidden: int
    out: int
    drop_rate: float = 0.0
    act: Callable = gelu_exact
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.dtype(self.compute_dtype)
        x = FeatureDense(self.hidden, dtype=dt, name="fc1")(x)
        x = self.act(x)
        x = FastDropout(self.drop_rate, deterministic=not train)(x)
        x = FeatureDense(self.out, dtype=dt, name="fc2")(x)
        return FastDropout(self.drop_rate, deterministic=not train)(x)


class DenseFromTransposed(nn.Module):
    """Projection that CONSUMES a feature-major activation: (g, h, dh, n) →
    (g, n, features), contracting the (h, dh) axes against the kernel in one
    dot_general — the inverse of ``TransposedDense``, again with the exact
    ``nn.Dense`` param tree (kernel (h·dh, features), bias)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = DENSE_INIT

    @nn.compact
    def __call__(self, x_t):
        g, h, dh, n = x_t.shape
        kernel = self.param("kernel", self.kernel_init,
                            (h * dh, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.reshape(h, dh, self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            x_t.astype(self.dtype), k, (((1, 2), (0, 1)), ((), ())),
            preferred_element_type=self.dtype)  # (g, n, features)
        return y + bias.astype(y.dtype)


class FeatureDenseFromWide(nn.Module):
    """Wide-kernel output (h, dh, T_h, SN) → FEATURE-MAJOR (features, T_h,
    SN): the kernel tensor is the lhs, contracting its (h·dh) rows against
    the attention output's leading axes — the feature-major stream regime's
    zero-relayout attention exit. Param tree ≡ ``nn.Dense``."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = DENSE_INIT

    @nn.compact
    def __call__(self, x_w):
        h, dh, t, sn = x_w.shape
        kernel = self.param("kernel", self.kernel_init,
                            (h * dh, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.reshape(h, dh, self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            k, x_w.astype(self.dtype), (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=self.dtype)  # (features, T_h, SN)
        return y + bias.astype(y.dtype).reshape(self.features, 1, 1)


class DenseFromWide(nn.Module):
    """Projection that CONSUMES the wide-kernel output layout (h, dh, g, n)
    → (g, n, features): one dot_general contracting the leading (h, dh)
    axes — the wide attention path's zero-relayout exit (the array is the
    kernel's (H, DH, T_h, SN) output viewed with (g, n) split, which is
    free). Param tree ≡ ``nn.Dense`` (kernel (h·dh, features), bias)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = DENSE_INIT

    @nn.compact
    def __call__(self, x_w):
        h, dh, g, n = x_w.shape
        kernel = self.param("kernel", self.kernel_init,
                            (h * dh, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        k = kernel.reshape(h, dh, self.features).astype(self.dtype)
        y = jax.lax.dot_general(
            x_w.astype(self.dtype), k, (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=self.dtype)  # (g, n, features)
        return y + bias.astype(y.dtype)
