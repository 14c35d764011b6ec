"""Edge-partitioned banded attention: halo-exchange sharded result equals the
unsharded computation (virtual CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
from sl_hwgat_tpu.ops.attention import banded_frame_attention
from sl_hwgat_tpu.parallel.edge_partition import sharded_banded_frame_attention


def make_band(vtok, spatial):
    eye = np.eye(vtok, dtype=np.float32)
    return jnp.asarray(
        np.stack([
            graphs.additive_mask(eye),
            graphs.additive_mask(spatial),
            graphs.additive_mask(eye),
        ])
    )


@pytest.mark.parametrize("shards", [2, 4])
def test_sharded_equals_unsharded_gate_band(shards):
    f, vtok, dh, g, h = 16, 29, 8, 2, 2
    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, edges_to_dense(BODY29_EDGES, vtok, self_loops=False))

    want = banded_frame_attention(q, k, v, band, scale=0.3)

    devices = np.asarray(jax.devices()[:shards]).reshape(shards)
    mesh = Mesh(devices, ("sp",))
    got = sharded_banded_frame_attention(q, k, v, band, mesh=mesh, axis="sp", scale=0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_equals_unsharded_wgate_band():
    f, vtok, dh = 8, 16, 4
    r = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 2, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, graphs.window_adj(window_size=vtok))
    want = banded_frame_attention(q, k, v, band, scale=0.5)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("sp",))
    got = sharded_banded_frame_attention(q, k, v, band, mesh=mesh, axis="sp", scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
