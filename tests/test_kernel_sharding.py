"""Fused Pallas kernel under shard_map (parallel/kernel_sharding.py):
sharded == unsharded on the virtual 8-device CPU mesh, including the
dual-mask (shifted-block) per-shard phase offset.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.models.hwgate import HWGATE
from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention
from sl_hwgat_tpu.parallel import kernel_sharding

ADJ32 = graphs.windowed_block_adj(2)[0]


def qkv(u, n, dh, seed=0):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)) for _ in range(3)
    )


def mesh2d(dp, sp):
    devs = np.array(jax.devices("cpu")[: dp * sp]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


@pytest.mark.parametrize("dp,sp", [(2, 1), (2, 2), (4, 2)])
def test_sharded_matches_unsharded_plain(dp, sp):
    q, k, v = qkv(32, 32, 16, seed=1)
    want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
    with kernel_sharding.sharded_window_attention(mesh2d(dp, sp)):
        got = kernel_sharding.call_sharded(q, k, v, ADJ32, scale=0.25, stack=4)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("dp,sp", [(2, 2), (4, 2)])
def test_sharded_matches_unsharded_dual_mask(dp, sp):
    # b=8 batch-groups, f=4 temporal groups, per_f=8 units/group: sp splits
    # temporal groups WITHIN a batch element (per-shard phase offset ≠ 0)
    per_f, f, b = 8, 4, 8
    q, k, v = qkv(b * f * per_f, 32, 16, seed=2)
    r = np.random.default_rng(3)
    tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
    kw = dict(scale=0.25, stack=4, tail_adj=tail, units_per_group=per_f, groups=f)
    want = pallas_window_attention(q, k, v, ADJ32, **kw)
    with kernel_sharding.sharded_window_attention(mesh2d(dp, sp)):
        got = kernel_sharding.call_sharded(q, k, v, ADJ32, **kw)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_sharded_gradients_match():
    q, k, v = qkv(32, 32, 16, seed=4)

    def loss(fn):
        def inner(q, k, v):
            o = fn(q, k, v)
            return jnp.sum(o * jnp.cos(o))
        return inner

    plain = lambda q, k, v: pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
    g_plain = jax.grad(loss(plain), argnums=(0, 1, 2))(q, k, v)
    with kernel_sharding.sharded_window_attention(mesh2d(2, 2)):
        sharded = lambda q, k, v: kernel_sharding.call_sharded(
            q, k, v, ADJ32, scale=0.25, stack=4)
        g_shard = jax.grad(loss(sharded), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_shard, g_plain, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)


def test_indivisible_units_fall_back():
    q, k, v = qkv(12, 32, 16, seed=5)  # 12 units % 8 shards != 0
    with kernel_sharding.sharded_window_attention(mesh2d(4, 2)):
        got = kernel_sharding.call_sharded(q, k, v, ADJ32, scale=0.25, stack=4)
    assert got is None


@pytest.mark.slow
def test_full_model_forward_under_context():
    """Whole HWGATE forward with the sharded fused kernel == stacked path."""
    x = jnp.asarray(np.random.default_rng(6).normal(size=(4, 16, 64, 2)), jnp.float32)
    stacked = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="stacked")
    fused = HWGATE(kp_dim=2, temporal_dim=16, num_classes=5, attn_impl="pallas")
    variables = stacked.init(jax.random.PRNGKey(0), x, train=False)
    want = stacked.apply(variables, x, train=False)
    with kernel_sharding.sharded_window_attention(mesh2d(2, 2)):
        got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_tp_head_major_shards_units(monkeypatch):
    """VERDICT r1 item 7: with a tp axis and head-major unit order, each
    shard's fused-kernel call must see U/(tp·dp·sp) units — attention compute
    is sharded, not replicated — and the result must equal the unsharded op."""
    from sl_hwgat_tpu.ops import pallas_attention as pa

    u, n, dh = 64, 32, 16
    q, k, v = qkv(u, n, dh, seed=7)
    want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)

    seen_units = []
    orig = pa.pallas_window_attention

    def spy(q_, *a, **kw):
        seen_units.append(int(q_.shape[0]))
        return orig(q_, *a, **kw)

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dp", "sp", "tp"))
    import sl_hwgat_tpu.ops.pallas_attention as pmod

    monkeypatch.setattr(pmod, "pallas_window_attention", spy)
    with kernel_sharding.sharded_window_attention(mesh):
        got = kernel_sharding.call_sharded(
            q, k, v, ADJ32, scale=0.25, stack=4, head_major=True)
    assert got is not None
    # shard_map traces the local computation once with per-shard shapes
    assert seen_units and all(su == u // 8 for su in seen_units), seen_units
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_hwgate_forward_tp_head_major_matches_plain():
    """Full HWGATE forward with a tp axis: head-major sharded attention must
    equal the head-minor unsharded forward (dual-mask stages included)."""
    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    r = np.random.default_rng(11)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dp", "sp", "tp"))
    with kernel_sharding.sharded_window_attention(mesh):
        got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


# --- Feature-major (wide-layout) sharding: kernel_sharding.call_wide --------


def qkv_wide(h, dh, t, sn=128, seed=20):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.normal(size=(h, dh, t, sn)).astype(np.float32))
        for _ in range(3)
    )


@pytest.mark.parametrize("dp,sp", [(2, 1), (2, 2), (4, 2)])
def test_call_wide_matches_unsharded_plain(dp, sp):
    q, k, v = qkv_wide(2, 16, 8, seed=21)
    want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4,
                                   transposed="wide")
    with kernel_sharding.sharded_window_attention(mesh2d(dp, sp)):
        got = kernel_sharding.call_wide(q, k, v, ADJ32, scale=0.25, stack=4)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("dp,sp", [(2, 2), (4, 2)])
def test_call_wide_dual_mask_per_shard_phase(dp, sp):
    # b=2 batch, f=4 temporal groups, nw=4 windows/frame → 8 supertiles per
    # head row; the dp·sp split lands mid-period, so per-shard sel vectors
    # must carry the GLOBAL group phase
    nw, f = 4, 4
    q, k, v = qkv_wide(2, 16, 8, seed=22)
    r = np.random.default_rng(23)
    tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
    kw = dict(scale=0.25, stack=4, tail_adj=tail, units_per_group=nw, groups=f)
    want = pallas_window_attention(q, k, v, ADJ32, transposed="wide", **kw)
    with kernel_sharding.sharded_window_attention(mesh2d(dp, sp)):
        got = kernel_sharding.call_wide(q, k, v, ADJ32, **kw)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_call_wide_tp_shards_heads(monkeypatch):
    """With a tp axis, call_wide must hand each shard h/tp head rows and
    T/(dp·sp) supertiles — attention compute fully sharded."""
    from sl_hwgat_tpu.ops import pallas_attention as pa

    q, k, v = qkv_wide(4, 16, 8, seed=24)
    want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4,
                                   transposed="wide")
    seen = []
    orig = pa.pallas_window_attention

    def spy(q_, *a, **kw):
        seen.append(tuple(q_.shape))
        return orig(q_, *a, **kw)

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dp", "sp", "tp"))
    import sl_hwgat_tpu.ops.pallas_attention as pmod

    monkeypatch.setattr(pmod, "pallas_window_attention", spy)
    with kernel_sharding.sharded_window_attention(mesh):
        got = kernel_sharding.call_wide(q, k, v, ADJ32, scale=0.25, stack=4)
    assert got is not None
    assert seen and all(s == (2, 16, 2, 128) for s in seen), seen
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_call_wide_indivisible_tiles_fall_back():
    q, k, v = qkv_wide(2, 16, 6, seed=25)  # 6 tiles % 8 shards != 0
    with kernel_sharding.sharded_window_attention(mesh2d(4, 2)):
        got = kernel_sharding.call_wide(q, k, v, ADJ32, scale=0.25, stack=4)
    assert got is None


@pytest.mark.slow
def test_fm_model_forward_under_context_matches_token():
    """Full HWGATE with the feature-major stream UNDER a dp/sp/tp sharding
    context == the token-major stacked path (shifted blocks + merge included)
    — VERDICT r4 item 3: the production layout composes with sharding."""
    kw = dict(kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
              depths=(1, 2), num_heads=(2, 2), drop_rate=0.0,
              prune_attn=False)
    token = HWGATE(**kw, attn_impl="stacked", stream_layout="token")
    fm = HWGATE(**kw, attn_impl="pallas", stream_layout="feature")
    r = np.random.default_rng(26)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = token.init(jax.random.PRNGKey(0), x, train=False)
    want = token.apply(variables, x, train=False)

    devs = np.array(jax.devices("cpu")[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dp", "sp", "tp"))
    with kernel_sharding.sharded_window_attention(mesh):
        got = fm.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
