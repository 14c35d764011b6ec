"""Checkpoint / resume / transfer loading.

≡ reference `hwgat/utils.py:164-237`:
- full-state save: variables + optimizer state + scheduler epoch + LR + the
  four history curves (single file, pickle of numpy pytrees);
- resume restores everything and continues at epoch+1;
- transfer loading is shape-checked and partial: mismatched/missing tensors
  keep their fresh init with a console report (`utils.py:185-214`). Sources
  can be our ``.ckpt`` files or reference PyTorch ``.pt`` checkpoints
  (cross-framework import, `train/torch_import.py`);
- experiment snapshot: config pickle + the source files of the model and
  transform definitions are copied into the run dir (`utils.py:178-183`).
"""

from __future__ import annotations

import os
import pickle
import shutil

import jax
import numpy as np

from sl_hwgat_tpu.train import torch_import

FORMAT_VERSION = 1

# ---------------------------------------------------------------------------
# Orbax backend (optional): async array I/O for large/multihost runs.
#
# Layout: the (variables, opt_state) pytree is flattened to a flat list of
# arrays saved through Orbax (async, sharding-aware, multihost-safe), while
# the treedef + scalar metadata (epoch/lr/history) go into a small pickle
# sidecar ``<path>.meta``. Restoring unflattens with the pickled treedef, so
# optax namedtuple structure survives the round trip exactly — no abstract
# target tree is needed at read time.
# ---------------------------------------------------------------------------

_ORBAX_CKPTR = None


def _orbax():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def wait_until_finished() -> None:
    """Block until any in-flight async (Orbax) save has committed."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def _save_orbax(path: str, payload: dict) -> None:
    import orbax.checkpoint as ocp

    leaves, treedef = jax.tree.flatten((payload["variables"], payload["opt_state"]))
    meta = {k: v for k, v in payload.items() if k not in ("variables", "opt_state")}
    meta["treedef"] = treedef
    ckptr = _orbax()
    ckptr.wait_until_finished()  # one in-flight save at a time, oldest first
    d = os.path.abspath(path)
    ckptr.save(d, args=ocp.args.StandardSave({"leaves": leaves}), force=True)
    tmp = d + ".meta.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, d + ".meta")


def _read_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    wait_until_finished()
    d = os.path.abspath(path)
    with open(d + ".meta", "rb") as f:
        meta = pickle.load(f)
    treedef = meta.pop("treedef")
    restored = _orbax().restore(d, args=ocp.args.StandardRestore())
    variables, opt_state = jax.tree.unflatten(treedef, restored["leaves"])
    return {**meta, "variables": variables, "opt_state": opt_state}


def save_checkpoint_sharded(path: str, variables, opt_state, epoch: int,
                            lr: float, history: dict) -> None:
    """Multihost sharded save (no replicate-to-host gather).

    EVERY process calls this with the LIVE sharded (variables, opt_state)
    jax arrays; Orbax writes each array shard from the process that addresses
    it — the full-state all-gather collective of the replicate-to-host path is
    skipped entirely, so checkpoint cost scales with 1/n_hosts. Requires a
    filesystem all hosts can reach (GCS/NFS on real pods; tmpdir in the
    localhost tests). The treedef/scalar sidecar ``<path>.meta`` is written by
    process 0 only."""
    import orbax.checkpoint as ocp

    leaves, treedef = jax.tree.flatten((variables, opt_state))
    meta = {
        "format_version": FORMAT_VERSION,
        "treedef": treedef,
        "epoch": epoch,
        "learning_rate": lr,
        "train_loss_list": history["train_loss"],
        "val_loss_list": history["val_loss"],
        "train_acc_list": history["train_acc"],
        "val_acc_list": history["val_acc"],
    }
    ckptr = _orbax()
    ckptr.wait_until_finished()
    d = os.path.abspath(path)
    ckptr.save(d, args=ocp.args.StandardSave({"leaves": leaves}), force=True)
    if jax.process_index() == 0:
        tmp = d + ".meta.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, d + ".meta")


def read_checkpoint_sharded(path: str, variables, opt_state) -> dict:
    """Sharded multihost restore: (variables, opt_state) are live templates
    whose shapes/dtypes/shardings drive the restore — each process reads only
    the shards it addresses, directly onto its devices."""
    import orbax.checkpoint as ocp

    wait_until_finished()
    d = os.path.abspath(path)
    with open(d + ".meta", "rb") as f:
        meta = pickle.load(f)
    treedef = meta.pop("treedef")
    leaves, _ = jax.tree.flatten((variables, opt_state))
    abstract = [
        jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=l.sharding)
        for l in leaves
    ]
    restored = _orbax().restore(
        d, args=ocp.args.StandardRestore({"leaves": abstract}))
    new_vars, new_opt = jax.tree.unflatten(treedef, restored["leaves"])
    return {**meta, "variables": new_vars, "opt_state": new_opt}


def save_checkpoint(path: str, state, lr: float, backend: str = "pickle") -> None:
    """≡ `utils.py:164-176`. ``backend``: 'pickle' (single-file, default) or
    'orbax' (async array I/O to a ``<path>/`` directory + ``<path>.meta``)."""
    variables, opt_state = state.to_numpy()
    payload = {
        "format_version": FORMAT_VERSION,
        "variables": variables,
        "opt_state": opt_state,
        "epoch": state.epoch,
        "learning_rate": lr,
        "train_loss_list": state.history["train_loss"],
        "val_loss_list": state.history["val_loss"],
        "train_acc_list": state.history["train_acc"],
        "val_acc_list": state.history["val_acc"],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    if backend != "pickle":
        raise ValueError(f"unknown checkpoint backend: {backend}")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def read_checkpoint(path: str) -> dict:
    """Read either backend's format (an Orbax checkpoint is a directory)."""
    if os.path.isdir(path):
        return _read_orbax(path)
    if not os.path.exists(path) and os.path.isfile(path + ".meta"):
        return _read_orbax(path)  # orbax dir pending async commit
    with open(path, "rb") as f:
        return pickle.load(f)


def variables_from_source(path: str, model_type: str) -> dict:
    """Variables tree from a ``.ckpt`` (ours) or ``.pt`` (reference torch)."""
    if path.endswith(".pt"):
        sd = torch_import.load_torch_checkpoint(path)
        if model_type in ("HWGATE", "HGATE", "WGATE", "GATE"):
            return torch_import.gat_family_from_torch(sd)
        if model_type == "STGCN":
            return torch_import.stgcn_from_torch(sd)
        if model_type == "DecoupledGCN":
            return torch_import.decoupled_gcn_from_torch(sd)
        if model_type == "Transformer":
            return torch_import.transformer_from_torch(sd)
        raise ValueError(f"no torch importer for model {model_type}")
    return read_checkpoint(path)["variables"]


def load_pretrained_into(state, path: str, model_type: str, verbose: bool = True):
    """Shape-checked partial weight load (fresh optimizer/history).
    ≡ `utils.py:185-214` + the `cfg.model_weights` branch of `load_checkpoint`."""
    source = variables_from_source(path, model_type)
    target = jax.tree.map(np.asarray, state.variables)
    merged = {}
    for col, tree in target.items():
        merged[col], _ = torch_import.partial_load(tree, source.get(col, {}), verbose=verbose)
    state.variables = jax.tree.map(np.asarray, merged)
    return state


def resume_from(state, path: str):
    """Full resume: variables, optimizer, epoch+1, history. ≡ `utils.py:226-237`."""
    ckpt = read_checkpoint(path)
    state.variables = ckpt["variables"]
    state.opt_state = ckpt["opt_state"]
    state.epoch = ckpt["epoch"] + 1
    state.history = {
        "train_loss": ckpt["train_loss_list"],
        "val_loss": ckpt["val_loss_list"],
        "train_acc": ckpt["train_acc_list"],
        "val_acc": ckpt["val_acc_list"],
    }
    return state


def save_experiment_snapshot(cfg) -> None:
    """Pickle the config + copy model/transform sources into the run dir.
    ≡ `utils.py:178-183`."""
    import sl_hwgat_tpu.configs as configs_mod
    import sl_hwgat_tpu.data.transforms as transforms_mod
    from sl_hwgat_tpu import models as models_pkg

    out = cfg.ensure_out_folder()
    with open(cfg.save_config_path, "wb") as f:
        pickle.dump(cfg, f)
    model_file = {
        "HWGATE": "hwgate", "HGATE": "hgate", "WGATE": "wgate", "GATE": "gate",
        "STGCN": "stgcn", "DecoupledGCN": "decoupled_gcn", "Transformer": "transformer",
    }[cfg.model_type]
    pkg_dir = os.path.dirname(models_pkg.__file__)
    shutil.copy(os.path.join(pkg_dir, model_file + ".py"), out)
    shutil.copy(configs_mod.__file__, out)
    shutil.copy(transforms_mod.__file__, out)
