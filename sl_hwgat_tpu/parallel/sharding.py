"""Sharding rules and sharded train/eval step builders.

Strategy (designed for TPU ICI, validated on a virtual CPU mesh):

- **dp**: batch axis of every array in the batch.
- **sp**: the temporal (frame) axis. HWGATE's windowed attention is local
  within TP-frame groups, so sequence sharding is communication-free except
  the cyclic roll of shifted blocks (a ±1-frame halo that GSPMD lowers to a
  collective-permute) and the temporal-merge reshape.
- **tp**: Megatron-style: QKV / fc1 kernels column-sharded, proj / fc2 kernels
  row-sharded; XLA inserts the psum on the row-sharded matmuls' outputs.

Everything is expressed as ``NamedSharding`` annotations on params and batch;
GSPMD propagates through the model and emits ICI collectives.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, PartitionSpec) — first match wins; default replicate.
# q/k/v kernels have HEAD-MAJOR output columns, so the column split lands on
# head groups (requires tp | num_heads) and stays expressible through the
# (g, n, h, dh) reshape — see models/hwgate.py::WindowedMSA.
TP_RULES: list[tuple[str, P]] = [
    (r".*/attn/(q|k|v)/kernel$", P(None, "tp")),
    (r".*/attn/(q|k|v)/bias$", P("tp")),
    (r".*/attn/proj/kernel$", P("tp", None)),
    (r".*/self_attn/in_proj/kernel$", P(None, "tp")),
    (r".*/self_attn/in_proj/bias$", P("tp")),
    (r".*/self_attn/out_proj/kernel$", P("tp", None)),
    (r".*/ff/fc1/kernel$", P(None, "tp")),
    (r".*/ff/fc1/bias$", P("tp")),
    (r".*/ff/fc2/kernel$", P("tp", None)),
    (r".*/linear1/kernel$", P(None, "tp")),
    (r".*/linear1/bias$", P("tp")),
    (r".*/linear2/kernel$", P("tp", None)),
]


def _path_str(path) -> str:
    return "/" + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def variable_sharding_rules(variables, mesh: Mesh, use_tp: bool = True):
    """PartitionSpec tree for the variable dict (params tp-sharded, buffers
    and batch stats replicated)."""

    def spec_for(path, leaf):
        p = _path_str(path)
        if use_tp:
            for pat, spec in TP_RULES:
                if re.match(pat, p):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, variables)


def shard_variables(variables, mesh: Mesh, use_tp: bool = True):
    """Place a variable tree onto the mesh according to the rules."""
    shardings = variable_sharding_rules(variables, mesh, use_tp)
    return jax.tree.map(jax.device_put, variables, shardings)


def batch_sharding(mesh: Mesh, seq_axis: int | None = 1):
    """Shardings for (x, y, valid): batch over dp, frames over sp."""
    if seq_axis == 1:
        x_spec = P("dp", "sp", None, None)
    else:
        x_spec = P("dp")
    return (
        NamedSharding(mesh, x_spec),
        NamedSharding(mesh, P("dp")),
        NamedSharding(mesh, P("dp")),
    )


def make_sharded_steps(model, optimizer, mesh: Mesh, variables, opt_state,
                       criterion_type: str = "smooth_cross_entropy",
                       rng_streams: tuple = ("dropout",),
                       mutable_stats: bool = False,
                       shard_sequence: bool = True,
                       use_tp: bool = True,
                       donate: bool = False,
                       grad_accum: int = 1):
    """Build jitted train/eval steps with explicit input shardings.

    Returns (train_step, eval_step, sharded_variables, sharded_opt_state).
    """
    from sl_hwgat_tpu.train.loop import make_steps

    var_sh = variable_sharding_rules(variables, mesh, use_tp)
    opt_sh = jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state)

    def place(tree, shardings):
        if jax.process_count() == 1:
            return jax.tree.map(jax.device_put, tree, shardings)
        # Multi-process: device_put cannot target non-addressable devices.
        # Every process holds the full value (identical seeded init), so
        # assemble global arrays from it — jax extracts the addressable
        # shards per process for any PartitionSpec.
        import numpy as np

        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                s, np.asarray(x), np.shape(x)),
            tree, shardings,
        )

    variables = place(variables, var_sh)
    # opt_state mirrors params structure inside; replicating it is correct and
    # simple (optimizer math is elementwise; GSPMD re-shards as needed).
    opt_state = place(opt_state, opt_sh)

    x_sh, y_sh, v_sh = batch_sharding(mesh, seq_axis=1 if shard_sequence else None)
    rep = NamedSharding(mesh, P())

    train_raw, eval_raw = make_steps(
        model, optimizer, criterion_type, rng_streams, mutable_stats,
        donate=False, grad_accum=grad_accum,
    )
    # out_shardings pin the state outputs to the input shardings so the
    # step composes with itself across calls — without this, GSPMD may pick
    # different output shardings (e.g. re-shard adam mu/nu to match tp
    # params), which a multi-process jit cannot implicitly reshard on the
    # next call's inputs.
    train_step = jax.jit(
        train_raw.__wrapped__,
        in_shardings=(var_sh, opt_sh, x_sh, y_sh, v_sh, rep, rep, rep),
        out_shardings=(var_sh, opt_sh, rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )
    eval_step = jax.jit(
        eval_raw.__wrapped__,
        static_argnums=(4,),
        in_shardings=(var_sh, x_sh, y_sh, v_sh),
    )

    # The fused Pallas kernel is not GSPMD-partitionable; activate the
    # shard_map context during each call so that when the model's attn_impl
    # resolves to 'pallas' (the TPU default), tracing routes attention through
    # parallel/kernel_sharding.call_sharded (per-shard fused kernels over
    # dp/sp) instead of a single un-partitionable pallas_call.
    from sl_hwgat_tpu.parallel import edge_partition, kernel_sharding

    def with_kernel_ctx(fn):
        def wrapped(*a, **k):
            # Banded models (WGATE/GATE) additionally route through the
            # explicit halo-exchange path when the mesh has an sp axis
            # (edge-partitioned training, BASELINE config 5).
            with kernel_sharding.sharded_window_attention(mesh), \
                    edge_partition.halo_banded_attention(mesh):
                return fn(*a, **k)
        return wrapped

    return with_kernel_ctx(train_step), with_kernel_ctx(eval_step), variables, opt_state
