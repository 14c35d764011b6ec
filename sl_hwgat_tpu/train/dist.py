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

Each process runs an identical seeded loader and materializes the full global
batch; jax extracts each process's addressable shards. For large-scale runs
shard the id list per process instead (noted in ROADMAP).

Tested without a cluster: two localhost CPU processes
(`tests/test_multiprocess_dcn.py::test_two_process_training`, RUN_DIST=1).
"""

from __future__ import annotations

import numpy as np


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

    def to_global(x, y, valid):
        """Assemble global arrays: every process runs an identical seeded
        loader, passes the full batch, and jax extracts the shards this
        process addresses (works for any dp/sp factorization)."""
        gx = jax.make_array_from_process_local_data(x_sh, np.asarray(x), x.shape)
        gy = jax.make_array_from_process_local_data(y_sh, np.asarray(y), y.shape)
        gv = jax.make_array_from_process_local_data(v_sh, np.asarray(valid), valid.shape)
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
