"""Multi-host distributed training (DCN across hosts, ICI within a host).

The reference has no distributed backend (SURVEY.md §2.4); this is the
TPU-native equivalent, designed for v5e-16-style 2-host slices:

- ``initialize()`` wraps ``jax.distributed.initialize`` (auto-detected on TPU
  pods; explicit coordinator/process args for CPU/localhost testing);
- ``run_distributed(cfg)`` builds a global ('dp','sp','tp') mesh over ALL
  hosts' devices, initializes identical parameters on every host (same seed),
  shards them with the GSPMD rules (`parallel/sharding.py`), and trains with
  global-batch arrays assembled from per-process local shards via
  ``jax.make_array_from_process_local_data`` — XLA lays dp gradient
  reductions over ICI within a host and DCN across hosts;
- every host computes identical metrics (the sharded step returns global
  scalars), so history/scheduling stay in lockstep; only process 0 writes
  checkpoints and curves.

Input sharding: every process runs an identical seeded batch SCHEDULE, but
loads/transforms only the contiguous batch-row range its devices address
(``Loader.row_slice``) — input IO and host transform cost stay O(1/n_proc).
Falls back to materializing the full global batch only when the mesh layout
makes a process's addressable region non-contiguous along the batch axis.

Tested without a cluster: two localhost CPU processes
(`tests/test_multiprocess_dcn.py::test_two_process_training`, RUN_DIST=1).
"""

from __future__ import annotations

import numpy as np


def _local_batch_slice(sharding, global_shape) -> tuple[int, int] | None:
    """Contiguous (lo, hi) batch-row range this process addresses under
    ``sharding``, or None when per-process slice loading is inapplicable
    (non-contiguous rows, or the process doesn't address the full extent of
    every non-batch dim)."""
    import jax

    imap = sharding.devices_indices_map(tuple(global_shape))
    pid = jax.process_index()
    ranges = set()
    for dev, idx in imap.items():
        if dev.process_index != pid:
            continue
        b = idx[0]
        lo = 0 if b.start is None else int(b.start)
        hi = global_shape[0] if b.stop is None else int(b.stop)
        ranges.add((lo, hi))
        for dim, s in enumerate(idx[1:], 1):
            if (s.start or 0) != 0 or (
                    global_shape[dim] if s.stop is None else s.stop
            ) != global_shape[dim]:
                return None  # e.g. sp frame-sharding split across processes
    if not ranges:
        return None
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    if sum(r[1] - r[0] for r in ranges) != hi - lo:
        return None  # non-contiguous
    return lo, hi


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the distributed job. On TPU pods all args are auto-detected;
    pass them explicitly for localhost/CPU testing."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def run_distributed(cfg, mesh_shape: tuple | None = None, progress=None):
    """Distributed train/eval flow. Returns (final metrics dict, state)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sl_hwgat_tpu.data.dataset import get_loaders
    from sl_hwgat_tpu.models import MODEL_NUM_KPS, MODEL_RNG_STREAMS, build_model
    from sl_hwgat_tpu.parallel import make_mesh, mesh_shape_for
    from sl_hwgat_tpu.parallel.sharding import batch_sharding, make_sharded_steps
    from sl_hwgat_tpu.train import checkpoint as ckpt_lib
    from sl_hwgat_tpu.train.loop import init_state
    from sl_hwgat_tpu.train.state import cosine_annealing_lr, set_lr

    n_dev = jax.device_count()
    n_proc = jax.process_count()
    pid = jax.process_index()
    shape = mesh_shape or mesh_shape_for(n_dev)
    mesh = make_mesh(shape)

    model = build_model(cfg.model_type, cfg.dataset_params, cfg.input_dim, **cfg.overrides)
    num_kps = MODEL_NUM_KPS[cfg.model_type]
    rng_streams = MODEL_RNG_STREAMS[cfg.model_type]
    has_bn = cfg.model_type in ("STGCN", "DecoupledGCN")

    state, optimizer = init_state(model, cfg, (cfg.src_len, num_kps, cfg.input_dim),
                                  rng_streams)
    train_step, eval_step, variables, opt_state = make_sharded_steps(
        model, optimizer, mesh, state.variables, state.opt_state,
        criterion_type=cfg.criterion_type, rng_streams=rng_streams,
        mutable_stats=has_bn,
    )
    state.variables, state.opt_state = variables, opt_state

    train_loader, val_loader, _ = get_loaders(
        cfg, cfg.train_transform(), cfg.eval_transform()
    )

    x_sh, y_sh, v_sh = batch_sharding(mesh)
    gx_shape = (cfg.batch_size, cfg.src_len, num_kps, cfg.input_dim)
    gy_shape = gv_shape = (cfg.batch_size,)

    # Per-process input sharding: each process loads/transforms ONLY the
    # batch rows its devices address (the batch SCHEDULE — shuffle order,
    # epoch boundaries — is identical everywhere, derived from the shared
    # seed). Requires the row slices of x/y/valid to agree, which they do:
    # all three shard the batch axis over 'dp' only.
    row_slice = None
    if n_proc > 1:
        row_slice = _local_batch_slice(x_sh, gx_shape)
        if row_slice is not None and row_slice != _local_batch_slice(y_sh, gy_shape):
            row_slice = None
        if row_slice is not None:
            train_loader.row_slice = row_slice
            val_loader.row_slice = row_slice

    def to_global(x, y, valid):
        """Assemble global arrays from this process's local rows (or from the
        full batch in the replicated fallback) — jax takes the addressable
        shards from the local data."""
        gx = jax.make_array_from_process_local_data(x_sh, np.asarray(x), gx_shape)
        gy = jax.make_array_from_process_local_data(y_sh, np.asarray(y), gy_shape)
        gv = jax.make_array_from_process_local_data(v_sh, np.asarray(valid), gv_shape)
        return gx, gy, gv

    key = jax.random.PRNGKey(cfg.seed)
    hist = state.history
    best_val_loss = 9999.0
    train_loss = train_acc = val_loss = val_acc = float("nan")

    # Replicate-to-host gather for checkpointing, jitted ONCE per tree
    # structure (a fresh lambda per epoch would re-trace the full-state
    # collective every improvement).
    rep = NamedSharding(mesh, P())
    _gather_cache = {}

    def to_host(tree, tag):
        if tag not in _gather_cache:
            _gather_cache[tag] = jax.jit(
                lambda t: t, out_shardings=jax.tree.map(lambda _: rep, tree))
        gathered = _gather_cache[tag](tree)
        return jax.tree.map(lambda a: np.asarray(a.addressable_data(0)), gathered)

    for epoch in range(state.epoch, cfg.epochs + 1):
        state.opt_state = set_lr(
            state.opt_state,
            cosine_annealing_lr(epoch, cfg.lr, cfg.scheduler_t_max)
            if cfg.scheduler == "CosineAnnealingLR" else cfg.lr,
        )
        tot, correct, seen, batches = 0.0, 0.0, 0.0, 0
        # the Loader pads the final batch to batch_size with a validity
        # mask, so every host sees identical fixed-shape batches
        for step, (x, y, valid) in enumerate(train_loader.epoch(epoch)):
            gx, gy, gv = to_global(x, y, valid)
            out = train_step(state.variables, state.opt_state, gx, gy, gv,
                             key, epoch, step)
            state.variables, state.opt_state = out[0], out[1]
            tot += float(out[2]); correct += float(out[3]); seen += float(out[4])
            batches += 1
        train_loss = tot / max(batches, 1)
        train_acc = correct / max(seen, 1.0)

        vtot, vcorrect, vseen, vbatches = 0.0, 0.0, 0.0, 0
        for x, y, valid in val_loader.epoch(epoch):
            gx, gy, gv = to_global(x, y, valid)
            loss, c, v, _ = eval_step(state.variables, gx, gy, gv, cfg.topk)
            vtot += float(loss); vcorrect += float(c); vseen += float(v)
            vbatches += 1
        val_loss = vtot / max(vbatches, 1)
        val_acc = vcorrect / max(vseen, 1.0)

        hist["train_loss"].append(train_loss)
        hist["train_acc"].append(train_acc)
        hist["val_loss"].append(val_loss)
        hist["val_acc"].append(val_acc)
        state.epoch = epoch

        if val_loss < best_val_loss:  # identical on every host (global metric)
            best_val_loss = val_loss
            if getattr(cfg, "ckpt_backend", "pickle") == "orbax":
                # Scalable path: Orbax writes each array shard from the
                # process that addresses it — no full-state all-gather, so
                # checkpoint cost stays O(1/n_hosts). Requires a shared
                # filesystem (GCS/NFS on pods; tmpdir in localhost tests).
                if pid == 0:
                    cfg.ensure_out_folder()
                ckpt_lib.save_checkpoint_sharded(
                    f"{cfg.save_model_path}_best_loss.ckpt",
                    state.variables, state.opt_state, state.epoch, cfg.lr,
                    state.history,
                )
            else:
                # Replicating to host is a COLLECTIVE (tp-sharded leaves span
                # processes), so every host participates; only process 0 writes.
                from sl_hwgat_tpu.train.state import TrainState

                host_state = TrainState(
                    variables=to_host(state.variables, "variables"),
                    opt_state=to_host(state.opt_state, "opt_state"),
                    epoch=state.epoch, base_lr=state.base_lr, history=state.history,
                )
                if pid == 0:
                    cfg.ensure_out_folder()
                    ckpt_lib.save_checkpoint(
                        f"{cfg.save_model_path}_best_loss.ckpt", host_state, cfg.lr,
                    )
        if progress is not None:
            progress(epoch, dict(train_loss=train_loss, train_acc=train_acc,
                                 val_loss=val_loss, val_acc=val_acc))

    ckpt_lib.wait_until_finished()
    return {"train": (train_loss, train_acc), "val": (val_loss, val_acc)}, state
