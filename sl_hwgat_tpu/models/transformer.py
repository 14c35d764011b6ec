"""Transformer baseline — flattened-keypoint sequence classifier.

Reference `hwgat/models/Transformer.py:8-177`: input (B, T, V, C) flattened to
(B, T, V·C), linear-projected ×√d, sinusoid PE, 3 post-norm encoder layers
(torch ``MultiheadAttention`` semantics incl. packed qkv projection and
key-padding mask from ``src[:, :, 0] == pad_index``), mean/max/concat pooling,
linear classifier. Init is xavier-uniform for matrices (`Transformer.py:80-85`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from sl_hwgat_tpu.models.common import FastDropout, sinusoid_table

_XAVIER = nn.initializers.xavier_uniform()
BIG_NEG = -1e9


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention``-compatible self-attention (batch_first)."""

    d_model: int
    nhead: int
    dropout: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False):
        b, t, d = x.shape
        h = self.nhead
        dh = d // h
        cdt = jnp.dtype(self.compute_dtype)
        qkv = nn.Dense(3 * d, kernel_init=_XAVIER, dtype=cdt, name="in_proj")(x)
        qkv = qkv.reshape(b, t, 3, h, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = jnp.einsum("bhid,bhjd->bhij", q / math.sqrt(dh), k,
                       preferred_element_type=jnp.float32)
        if key_padding_mask is not None:
            s = s + jnp.where(key_padding_mask, BIG_NEG, 0.0)[:, None, None, :]
        a = jax.nn.softmax(s, axis=-1)  # f32 softmax
        a = FastDropout(self.dropout, deterministic=not train)(a)
        out = jnp.einsum("bhij,bhjd->bhid", a.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(cdt).transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, kernel_init=_XAVIER, dtype=cdt, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Post-norm encoder layer. ≡ `Transformer.py:102-144`."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = False):
        cdt = jnp.dtype(self.compute_dtype)
        sa = TorchMHA(self.d_model, self.nhead, self.dropout,
                      compute_dtype=self.compute_dtype, name="self_attn")(
            x, key_padding_mask, train=train
        )
        sa = FastDropout(self.dropout, deterministic=not train)(sa)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + sa)
        h = nn.Dense(self.dim_feedforward, kernel_init=_XAVIER, dtype=cdt, name="linear1")(x)
        h = FastDropout(self.dropout, deterministic=not train)(nn.relu(h))
        h = nn.Dense(self.d_model, kernel_init=_XAVIER, dtype=cdt, name="linear2")(h)
        h = FastDropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class TransformerClassifier(nn.Module):
    """Defaults ≡ ``TransformerParams`` (`model_params.py:590-605`)."""

    input_dim: int = 58  # V·C
    num_classes: int = 1000
    pad_index: float = -1.0
    d_model: int = 512
    nhead: int = 8
    dim_feedforward: int = 2048
    num_encoder_layers: int = 3
    dropout: float = 0.1
    max_len: int = 64
    pool: str = "mean"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        x = x.reshape(b, x.shape[1], -1)
        mask = x[:, :, 0] == self.pad_index  # key padding, `Transformer.py:40-49`
        x = nn.Dense(self.d_model, kernel_init=_XAVIER, name="encoder")(x) * math.sqrt(self.d_model)
        pe = self.variable(
            "buffers", "pe", lambda *_: jnp.asarray(sinusoid_table(self.max_len, self.d_model)), None
        )
        x = x + pe.value[None, : x.shape[1], :]
        x = FastDropout(self.dropout, deterministic=not train)(x)
        for i in range(self.num_encoder_layers):
            x = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                compute_dtype=self.compute_dtype, name=f"layers_{i}",
            )(x, mask, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        if self.pool == "concat":
            x = x.reshape(b, -1)
        elif self.pool == "max":
            x = jnp.max(x, axis=1)
        else:
            x = jnp.mean(x, axis=1)
        return nn.Dense(self.num_classes, kernel_init=_XAVIER, name="classifier")(x)


def transformer_from_dataset(dataset_params: dict, input_dim: int, **overrides) -> TransformerClassifier:
    kw = dict(
        input_dim=input_dim * 29,
        num_classes=dataset_params["num_class"],
        pad_index=-1.0,
        d_model=512,
        nhead=8,
        dim_feedforward=2048,
        num_encoder_layers=3,
        dropout=0.1,
        max_len=dataset_params["src_len"],
        pool="mean",
    )
    kw.update(overrides)
    return TransformerClassifier(**kw)
