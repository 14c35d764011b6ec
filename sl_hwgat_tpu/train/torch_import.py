"""Cross-framework weight import: reference PyTorch checkpoints → flax variables.

Satisfies the transfer-learning capability of the reference
(`hwgat/utils.py:185-214`: shape-checked partial load with "model." prefix
stripping) and powers per-layer parity tests (BASELINE.md: per-layer
activations allclose vs the reference with identical weights).

Works on plain dicts of numpy arrays so torch is only needed by the caller
that reads the ``.pt`` file.
"""

from __future__ import annotations

import re
from typing import Mapping

import numpy as np


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _dense(dst: dict, path: tuple[str, ...], kind: str, value: np.ndarray) -> None:
    if kind == "weight":
        _set(dst, path + ("kernel",), value.T)  # torch (out,in) → flax (in,out)
    else:
        _set(dst, path + ("bias",), value)


def _layernorm(dst: dict, path: tuple[str, ...], kind: str, value: np.ndarray) -> None:
    _set(dst, path + ("scale" if kind == "weight" else "bias",), value)


def hwgate_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference HWGATE ``model_state_dict`` → {'params': ..., 'buffers': ...}.

    Key layout of the reference model (`HWGATE.py:260-331`):
    ``B``, ``pos_encoder.pe``, ``layers.{i}.blocks.{j}.{norm1,norm2}.*``,
    ``...attn.{qkv,proj}.*``, ``...ff.{fc1,fc2}.*``, ``norm.*``, ``head.*``.
    Also accepts HGATE checkpoints (identical key layout).
    """
    params: dict = {}
    buffers: dict = {}
    blk = re.compile(
        r"layers\.(\d+)\.blocks\.(\d+)\.(norm1|norm2|attn\.qkv|attn\.proj|ff\.fc1|ff\.fc2)\.(weight|bias)$"
    )
    for key, val in state_dict.items():
        v = np.asarray(val, dtype=np.float32)
        if key == "B":
            _set(buffers, ("fourier", "B"), v)
        elif key == "pos_encoder.pe":
            _set(buffers, ("pos_encoder", "pe"), v[0, :, 0, :])  # (1,T,1,D) → (T,D)
        elif key in ("norm.weight", "norm.bias"):
            _layernorm(params, ("norm",), key.split(".")[1], v)
        elif key in ("head.weight", "head.bias"):
            _dense(params, ("head",), key.split(".")[1], v)
        elif m := blk.match(key):
            i, j, sub, kind = m.group(1), m.group(2), m.group(3), m.group(4)
            base = (f"layers_{i}_blocks_{j}",) + tuple(sub.split("."))
            if sub.startswith("norm"):
                _layernorm(params, base, kind, v)
            else:
                _dense(params, base, kind, v)
        elif key == "weightedAvg.weight":  # GATE pooling head
            _dense(params, ("weightedAvg",), "weight", v)
        elif key == "weightedAvg.bias":
            _dense(params, ("weightedAvg",), "bias", v)
        # Masks are rebuilt from the graph IR, not imported: adj_mask is the
        # additive adjacency buffer; attn_mask is the reference's shift mask,
        # which its fill-order bug makes all-ones (see models/hwgate.py).
        elif key.endswith("adj_mask") or key.endswith("attn_mask"):
            continue
        else:
            raise KeyError(f"unmapped reference key: {key}")
    return {"params": params, "buffers": buffers}


def strip_model_prefix(state_dict: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """≡ `utils.py:188`: drop a leading "model." from every key."""
    return {k.replace("model.", "", 1) if k.startswith("model.") else k: v
            for k, v in state_dict.items()}


def partial_load(target_tree: dict, source_tree: dict, verbose: bool = True):
    """Shape-checked partial update, keeping target values on mismatch/absence.

    ≡ `utils.py:185-214`. Returns (merged_tree, skipped_paths).
    """
    skipped: list[str] = []

    def merge(dst, src, path=""):
        if not isinstance(dst, dict):
            if src is None:
                skipped.append(path)
                return dst
            if np.shape(dst) != np.shape(src):
                skipped.append(path)
                return dst
            return np.asarray(src, dtype=np.asarray(dst).dtype)
        out = {}
        for k, v in dst.items():
            sub = src.get(k) if isinstance(src, dict) else None
            out[k] = merge(v, sub, f"{path}/{k}")
        return out

    merged = merge(target_tree, source_tree)
    if verbose and skipped:
        print("[torch_import] kept fresh init for:", ", ".join(skipped))
    return merged, skipped


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a reference ``.pt`` file → numpy state dict (CPU, no grad)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return strip_model_prefix({k: v.detach().cpu().numpy() for k, v in sd.items()})
