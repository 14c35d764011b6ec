"""SPMD layout regressions (VERDICT r2 item 2).

The factored head/group sharding (`parallel/kernel_sharding.py::call_factored`
+ the separate head-major-column q/k/v projections) must keep GSPMD from
falling into involuntary full rematerialization at the attention relayout
sites. `tools/remat_repro.py` compiles the flagship sharded train+eval step on
a (2,2,2) virtual mesh with XLA's stderr captured at the fd level and exits
non-zero if any warning appears.

Also checks the numerical equivalence of `call_factored` against the plain
kernel on the virtual mesh.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_no_involuntary_full_remat():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "remat_repro.py")],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_dryrun_multichip_without_driver_env():
    """Driver-interface regression: `dryrun_multichip` must self-apply the
    CPU-platform override when invoked in a bare process (the image
    sitecustomize otherwise pins the single-chip TPU tunnel and the mesh
    construction fails with one device)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip OK" in r.stdout
    assert "Involuntary full rematerialization" not in r.stderr


def _mesh():
    from sl_hwgat_tpu.parallel import make_mesh

    return make_mesh((2, 2, 2), devices=jax.devices()[:8])


def test_call_factored_matches_plain():
    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention
    from sl_hwgat_tpu.parallel import kernel_sharding

    h, g, n, dh = 4, 16, 32, 16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(h, g, n, dh)).astype(np.float32))
               for _ in range(3))
    adj = (rng.uniform(size=(n, n)) > 0.5).astype(np.float32)
    np.fill_diagonal(adj, 1.0)

    with kernel_sharding.sharded_window_attention(_mesh()):
        out = kernel_sharding.call_factored(q, k, v, adj, scale=0.25, stack=4)
    assert out is not None
    # plain: flatten (h, g) and run unsharded
    ref = pallas_window_attention(
        q.reshape(h * g, n, dh), k.reshape(h * g, n, dh),
        v.reshape(h * g, n, dh), adj, scale=0.25, stack=4)
    np.testing.assert_allclose(np.asarray(out).reshape(h * g, n, dh),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_call_factored_dual_mask_matches_plain():
    """Shifted-block selector: shards' units are non-contiguous, the selector
    must still fire exactly on the globally-last temporal group."""
    from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention
    from sl_hwgat_tpu.parallel import kernel_sharding

    h, n, dh = 4, 32, 16
    nw, f, b = 4, 4, 2  # g = b * f * nw = 32 → g_loc = 8 per (dp, sp) shard
    g = b * f * nw
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(h, g, n, dh)).astype(np.float32))
               for _ in range(3))
    adj = (rng.uniform(size=(n, n)) > 0.5).astype(np.float32)
    np.fill_diagonal(adj, 1.0)
    tail = adj * (np.arange(n)[:, None] % 2 == np.arange(n)[None, :] % 2)

    with kernel_sharding.sharded_window_attention(_mesh()):
        out = kernel_sharding.call_factored(
            q, k, v, adj, scale=0.25, stack=4,
            tail_adj=tail, units_per_group=nw, groups=f)
    assert out is not None
    # plain equivalent: unit order (h, b, f, nW) flattened → group period nw
    ref = pallas_window_attention(
        q.reshape(h * g, n, dh), k.reshape(h * g, n, dh),
        v.reshape(h * g, n, dh), adj, scale=0.25, stack=4,
        tail_adj=tail, units_per_group=nw, groups=f)
    np.testing.assert_allclose(np.asarray(out).reshape(h * g, n, dh),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_call_factored_inapplicable_returns_none():
    from sl_hwgat_tpu.parallel import kernel_sharding

    h, g, n, dh = 3, 16, 32, 16  # h % tp != 0
    q = jnp.zeros((h, g, n, dh), jnp.float32)
    adj = np.eye(n, dtype=np.float32)
    with kernel_sharding.sharded_window_attention(_mesh()):
        out = kernel_sharding.call_factored(q, q, q, adj, scale=0.25, stack=4)
    assert out is None
    # no context at all
    out = kernel_sharding.call_factored(q, q, q, adj, scale=0.25, stack=4)
    assert out is None
