"""Device-mesh setup and sharding rules (dp / sp / tp) for pjit-compiled
training. See SURVEY.md §2.4: the reference is single-device; parallelism here
is designed TPU-first — batch data-parallel, temporal-axis sequence-parallel
(HWGATE's hierarchy makes cross-shard traffic a ±1-frame halo), and
Megatron-style tensor-parallel QKV/FFN sharding, all expressed as
``jax.sharding`` annotations compiled by XLA/GSPMD into ICI collectives."""

from sl_hwgat_tpu.parallel.mesh import make_mesh, mesh_shape_for
from sl_hwgat_tpu.parallel.sharding import (
    batch_sharding,
    make_sharded_steps,
    shard_variables,
    variable_sharding_rules,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "batch_sharding",
    "shard_variables",
    "variable_sharding_rules",
    "make_sharded_steps",
]
