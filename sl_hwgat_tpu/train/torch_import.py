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
    sub_re = r"(norm1|norm2|attn\.qkv|attn\.proj|ff\.fc1|ff\.fc2)\.(weight|bias)$"
    blk = re.compile(r"layers\.(\d+)\.blocks\.(\d+)\." + sub_re)   # HWGATE/HGATE
    flat = re.compile(r"layers\.(\d+)\." + sub_re)                  # WGATE/GATE

    def put(base: tuple[str, ...], sub: str, kind: str, v: np.ndarray):
        if sub == "attn.qkv":
            # Our MSA uses three separate q/k/v projections (head-major
            # columns, tp-shardable); the reference packs them as one
            # (3d, d) torch Linear with rows ordered [q | k | v].
            third = v.shape[0] // 3
            for i, nm in enumerate(("q", "k", "v")):
                _dense(params, base + ("attn", nm), kind,
                       v[i * third:(i + 1) * third])
            return
        path = base + tuple(sub.split("."))
        (_layernorm if sub.startswith("norm") else _dense)(params, path, kind, v)

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
            put((f"layers_{m.group(1)}_blocks_{m.group(2)}",), m.group(3), m.group(4), v)
        elif m := flat.match(key):
            put((f"layers_{m.group(1)}",), m.group(2), m.group(3), v)
        elif key in ("weightedAvg.weight", "weightedAvg.bias"):  # GATE pooling
            _dense(params, ("weightedAvg",), key.split(".")[1], v)
        # Masks are rebuilt from the graph IR, not imported: adj_mask is the
        # additive adjacency buffer; attn_mask is the reference's shift mask,
        # which its fill-order bug makes all-ones (see models/hwgate.py).
        elif key.endswith("adj_mask") or key.endswith("attn_mask"):
            continue
        else:
            raise KeyError(f"unmapped reference key: {key}")
    return {"params": params, "buffers": buffers}


# The key layout is shared by all four attention models of the family
# (HWGATE, HGATE nested; WGATE, GATE flat).
gat_family_from_torch = hwgate_from_torch


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


def _conv(dst: dict, path: tuple[str, ...], kind: str, value: np.ndarray) -> None:
    if kind == "weight":
        # torch conv2d (O, I, kh, kw) → flax (kh, kw, I, O)
        _set(dst, path + ("kernel",), value.transpose(2, 3, 1, 0))
    else:
        _set(dst, path + ("bias",), value)


def _bn(params: dict, stats: dict, path: tuple[str, ...], kind: str, value: np.ndarray) -> None:
    if kind == "weight":
        _set(params, path + ("scale",), value)
    elif kind == "bias":
        _set(params, path + ("bias",), value)
    elif kind == "running_mean":
        _set(stats, path + ("mean",), value)
    elif kind == "running_var":
        _set(stats, path + ("var",), value)
    # num_batches_tracked is dropped


def stgcn_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference STGCN ``model_state_dict`` → {'params', 'batch_stats'}.

    Key layout (`STGCN.py:194-237`): ``data_bn``, ``st_gcn_networks.{i}`` with
    ``gcn.conv``, ``tcn.{0,2,3}`` (BN, Conv, BN), optional ``residual.{0,1}``,
    ``edge_importance.{i}``, ``head.classifier``; buffer ``A`` is rebuilt from
    the graph IR.
    """
    params: dict = {}
    stats: dict = {}
    rx = re.compile(r"st_gcn_networks\.(\d+)\.(.+)$")
    for key, val in state_dict.items():
        v = np.asarray(val, dtype=np.float32)
        if key == "A" or key.endswith("num_batches_tracked"):
            continue
        if key.startswith("data_bn."):
            _bn(params, stats, ("data_bn",), key.split(".", 1)[1], v)
        elif key.startswith("edge_importance."):
            idx = key.split(".")[1]
            _set(params, (f"edge_importance_{idx}",), v)
        elif key.startswith("head.classifier."):
            _dense(params, ("classifier",), key.rsplit(".", 1)[1], v)
        elif m := rx.match(key):
            i, rest = m.group(1), m.group(2)
            base = (f"st_gcn_{i}",)
            sub, kind = rest.rsplit(".", 1)
            if sub == "gcn.conv":
                _conv(params, base + ("gcn", "conv"), kind, v)
            elif sub == "tcn.0":
                _bn(params, stats, base + ("tcn_bn1",), kind, v)
            elif sub == "tcn.2":
                _conv(params, base + ("tcn_conv",), kind, v)
            elif sub == "tcn.3":
                _bn(params, stats, base + ("tcn_bn2",), kind, v)
            elif sub == "residual.0":
                _conv(params, base + ("res_conv",), kind, v)
            elif sub == "residual.1":
                _bn(params, stats, base + ("res_bn",), kind, v)
            else:
                raise KeyError(f"unmapped STGCN key: {key}")
        else:
            raise KeyError(f"unmapped STGCN key: {key}")
    return {"params": params, "batch_stats": stats}


def decoupled_gcn_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference DecoupledGCN ``model_state_dict`` → {'params', 'batch_stats'}.

    Key layout (`DecoupledGCN.py:361-455`): ``data_bn``, ``l{1..10}`` blocks
    with ``gcn1.{decoupled_A, linear_weight, linear_bias, bn0, bn, down}``,
    ``conv_sa/conv_ta/fc1c/fc2c``, ``tcn1.{conv,bn}``, ``residual.{conv,bn}``;
    buffers ``A`` / ``eye_list`` are rebuilt from the graph IR.
    """
    params: dict = {}
    stats: dict = {}
    rx = re.compile(r"l(\d+)\.(.+)$")
    for key, val in state_dict.items():
        v = np.asarray(val, dtype=np.float32)
        if key.endswith("num_batches_tracked") or key.endswith(".A") or key.endswith("eye_list"):
            continue
        if key.startswith("data_bn."):
            _bn(params, stats, ("data_bn",), key.split(".", 1)[1], v)
            continue
        if key.startswith("head.classifier."):
            _dense(params, ("classifier",), key.rsplit(".", 1)[1], v)
            continue
        m = rx.match(key)
        if not m:
            raise KeyError(f"unmapped DecoupledGCN key: {key}")
        base = (f"l{m.group(1)}",)
        rest = m.group(2)
        sub, kind = rest.rsplit(".", 1)
        if sub == "gcn1" and kind == "decoupled_A":
            _set(params, base + ("gcn1", "decoupled_A"), v)
        elif sub == "gcn1" and kind == "linear_weight":
            _set(params, base + ("gcn1", "linear_weight"), v)
        elif sub == "gcn1" and kind == "linear_bias":
            _set(params, base + ("gcn1", "linear_bias"), v.reshape(-1))
        elif sub == "gcn1.bn0":
            _bn(params, stats, base + ("gcn1", "bn0"), kind, v)
        elif sub == "gcn1.bn":
            _bn(params, stats, base + ("gcn1", "bn"), kind, v)
        elif sub == "gcn1.down.0":
            _conv(params, base + ("gcn1", "down_conv"), kind, v)
        elif sub == "gcn1.down.1":
            _bn(params, stats, base + ("gcn1", "down_bn"), kind, v)
        elif sub in ("conv_sa", "conv_ta"):
            if kind == "weight":  # torch conv1d (1, C, k) → flax (k, C, 1)
                _set(params, base + (sub, "kernel"), v.transpose(2, 1, 0))
            else:
                _set(params, base + (sub, "bias"), v)
        elif sub in ("fc1c", "fc2c"):
            _dense(params, base + (sub,), kind, v)
        elif sub == "tcn1.conv":
            _conv(params, base + ("tcn1", "conv"), kind, v)
        elif sub == "tcn1.bn":
            _bn(params, stats, base + ("tcn1", "bn"), kind, v)
        elif sub == "residual.conv":
            _conv(params, base + ("residual", "conv"), kind, v)
        elif sub == "residual.bn":
            _bn(params, stats, base + ("residual", "bn"), kind, v)
        else:
            raise KeyError(f"unmapped DecoupledGCN key: {key}")
    return {"params": params, "batch_stats": stats}


def transformer_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Reference Transformer ``model_state_dict`` → {'params', 'buffers'}.

    Key layout (`Transformer.py:8-99`): ``encoder``, ``pos_encoder.pe``,
    ``transformer_encoder.layers.{i}.{self_attn,linear1,linear2,norm1,norm2}``,
    ``transformer_encoder.norm``, ``classifier`` (plain or ``classifier.0``
    for concat pooling).
    """
    params: dict = {}
    buffers: dict = {}
    rx = re.compile(r"transformer_encoder\.layers\.(\d+)\.(.+)$")
    for key, val in state_dict.items():
        v = np.asarray(val, dtype=np.float32)
        if key == "pos_encoder.pe":
            _set(buffers, ("pe",), v[0])  # (1, T, D) → (T, D)
        elif key.startswith("encoder."):
            _dense(params, ("encoder",), key.split(".")[1], v)
        elif key.startswith("classifier."):
            kind = key.rsplit(".", 1)[1]
            _dense(params, ("classifier",), kind, v)
        elif key.startswith("transformer_encoder.norm."):
            _layernorm(params, ("norm",), key.rsplit(".", 1)[1], v)
        elif m := rx.match(key):
            base = (f"layers_{m.group(1)}",)
            sub, kind = m.group(2).rsplit(".", 1)
            if sub == "self_attn.in_proj_weight" or m.group(2) == "self_attn.in_proj_weight":
                _dense(params, base + ("self_attn", "in_proj"), "weight", v)
            elif m.group(2) == "self_attn.in_proj_bias":
                _dense(params, base + ("self_attn", "in_proj"), "bias", v)
            elif sub == "self_attn.out_proj":
                _dense(params, base + ("self_attn", "out_proj"), kind, v)
            elif sub in ("linear1", "linear2"):
                _dense(params, base + (sub,), kind, v)
            elif sub in ("norm1", "norm2"):
                _layernorm(params, base + (sub,), kind, v)
            else:
                raise KeyError(f"unmapped Transformer key: {key}")
        else:
            raise KeyError(f"unmapped Transformer key: {key}")
    return {"params": params, "buffers": buffers}


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a reference ``.pt`` file → numpy state dict (CPU, no grad)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return strip_model_prefix({k: v.detach().cpu().numpy() for k, v in sd.items()})
