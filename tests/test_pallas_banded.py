"""Fused banded Pallas kernel ≡ the jnp banded op (forward and gradients),
at GATE (V=29) and WGATE (V=16 windows) shapes. Runs in interpreter mode on
CPU; the same code compiles via Mosaic on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
from sl_hwgat_tpu.ops.attention import banded_frame_attention
from sl_hwgat_tpu.ops.pallas_banded import pallas_banded_frame_attention


def make_band(vtok, spatial):
    eye = np.eye(vtok, dtype=np.float32)
    return np.stack([
        graphs.additive_mask(eye),
        graphs.additive_mask(spatial),
        graphs.additive_mask(eye),
    ])


CASES = {
    # (V, band adjacency): GATE 29-joint whole-body graph; WGATE 16-kp window
    "gate29": (29, lambda: edges_to_dense(BODY29_EDGES, 29, self_loops=False)),
    "wgate16": (16, lambda: graphs.window_adj(window_size=16)),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_forward_matches_jnp_banded(case):
    vtok, adj_fn = CASES[case]
    vp = 32 if vtok > 16 else 16
    ft = 128 // vp
    f = 4 * ft  # several sub-tiles
    g, h, dh = 2, 2, 16
    r = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, adj_fn())
    want = banded_frame_attention(q, k, v, jnp.asarray(band), scale=0.25)
    got = pallas_banded_frame_attention(q, k, v, band, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("case", sorted(CASES))
def test_gradients_match_jnp_banded(case):
    vtok, adj_fn = CASES[case]
    vp = 32 if vtok > 16 else 16
    ft = 128 // vp
    f = 3 * ft
    g, h, dh = 1, 2, 8
    r = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, adj_fn())
    bj = jnp.asarray(band)

    def loss_ref(q, k, v):
        o = banded_frame_attention(q, k, v, bj, scale=0.25)
        return jnp.sum(jnp.sin(o))

    def loss_pl(q, k, v):
        o = pallas_banded_frame_attention(q, k, v, band, scale=0.25)
        return jnp.sum(jnp.sin(o))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for name, w, g_ in zip("qkv", want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w), atol=3e-5,
                                   err_msg=name)


def test_single_block_sequence():
    """F small enough for one grid block (boundary tiles are also the only
    tiles): both global-edge selects must fire within one block."""
    vtok, vp = 29, 32
    f = 8  # 2 sub-tiles at ft=4 → tg=2, one grid step
    r = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 1, f, vtok, 4)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, edges_to_dense(BODY29_EDGES, vtok, self_loops=False))
    want = banded_frame_attention(q, k, v, jnp.asarray(band), scale=0.5)
    got = pallas_banded_frame_attention(q, k, v, band, scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gate_model_pallas_banded_impl_matches_default():
    """GATE with attn_impl='pallas_banded' routes through the fused kernel
    and matches the jnp banded forward."""
    import jax
    from sl_hwgat_tpu.models.gate import GATE

    kw = dict(kp_dim=2, num_kps=29, temporal_dim=8, num_classes=5,
              embed_dim=32, depths=2, num_heads=2, drop_rate=0.0)
    ref = GATE(**kw)
    fused = GATE(**kw, attn_impl="pallas_banded")
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 8, 29, 2)),
                    jnp.float32)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    want = ref.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_compact_matches_banded_fwd_and_grad():
    """The identity-temporal compact form must equal the generic band op
    bit-for-bit up to f32 rounding (the dropped -1e4 entries underflow to
    exactly zero weight)."""
    import jax

    from sl_hwgat_tpu.graphs.adjacency import additive_mask
    from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES, edges_to_dense
    from sl_hwgat_tpu.ops.attention import (banded_frame_attention,
                                            compact_banded_frame_attention)

    G, H, F, V, DH = 2, 3, 8, 29, 16
    eye = np.eye(V, dtype=np.float32)
    spatial = edges_to_dense(BODY29_EDGES, V, self_loops=False)
    band = jnp.asarray(np.stack([additive_mask(eye), additive_mask(spatial),
                                 additive_mask(eye)]))
    r = np.random.default_rng(3)
    q, k, v = (jnp.asarray(r.normal(size=(G, H, F, V, DH)).astype(np.float32))
               for _ in range(3))
    want = banded_frame_attention(q, k, v, band, scale=0.25)
    got = compact_banded_frame_attention(q, k, v, band[1], scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    gw = jax.grad(lambda qq: float(0) + jnp.sum(jnp.cos(
        banded_frame_attention(qq, k, v, band, scale=0.25))))(q)
    gc = jax.grad(lambda qq: jnp.sum(jnp.cos(
        compact_banded_frame_attention(qq, k, v, band[1], scale=0.25))))(q)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gw), atol=5e-6)

    # halo interface parity (the edge-partition training path)
    lk, lv, rk, rv = (jnp.asarray(r.normal(size=(G, H, 1, V, DH)).astype(np.float32))
                      for _ in range(4))
    for ev in ((jnp.float32(1), jnp.float32(0)), (jnp.float32(0), jnp.float32(1))):
        want = banded_frame_attention(q, k, v, band, scale=0.25,
                                      halo=(lk, lv, rk, rv), edge_valid=ev)
        got = compact_banded_frame_attention(q, k, v, band[1], scale=0.25,
                                             halo=(lk, lv, rk, rv), edge_valid=ev)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("case", sorted(CASES))
def test_packed_forward_matches_jnp_banded(case):
    """Round-4 frame-packed kernel (batched dots + VPU identity band)
    ≡ the jnp banded op."""
    from sl_hwgat_tpu.ops.pallas_banded import pallas_packed_banded_attention

    vtok, adj_fn = CASES[case]
    vp = 32 if vtok > 16 else 16
    f = 4 * (128 // vp)
    g, h, dh = 2, 2, 16
    r = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, adj_fn())
    want = banded_frame_attention(q, k, v, jnp.asarray(band), scale=0.25)
    got = pallas_packed_banded_attention(q, k, v, band, scale=0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("case", sorted(CASES))
def test_packed_gradients_match_jnp_banded(case):
    from sl_hwgat_tpu.ops.pallas_banded import pallas_packed_banded_attention

    vtok, adj_fn = CASES[case]
    vp = 32 if vtok > 16 else 16
    f = 3 * (128 // vp)
    g, h, dh = 1, 2, 8
    r = np.random.default_rng(6)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, adj_fn())
    bj = jnp.asarray(band)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(banded_frame_attention(q, k, v, bj, scale=0.25)))

    def loss_pk(q, k, v):
        return jnp.sum(jnp.sin(
            pallas_packed_banded_attention(q, k, v, band, scale=0.25)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_pk, argnums=(0, 1, 2))(q, k, v)
    for name, w, g_ in zip("qkv", want, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w), atol=3e-5,
                                   err_msg=name)


def test_packed_single_tile_and_rejects_nondiagonal():
    """Global-boundary masking with exactly one 128-token tile; non-diagonal
    prev/next planes must raise (the VPU band path assumes identity)."""
    from sl_hwgat_tpu.ops.pallas_banded import pallas_packed_banded_attention

    vtok, f = 29, 4  # 4 frames × Vp 32 = one tile
    r = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 1, f, vtok, 4)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, edges_to_dense(BODY29_EDGES, vtok, self_loops=False))
    want = banded_frame_attention(q, k, v, jnp.asarray(band), scale=0.5)
    got = pallas_packed_banded_attention(q, k, v, band, scale=0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    bad = band.copy()
    bad[0] = band[1]  # spatial (non-diagonal) prev plane
    with pytest.raises(ValueError):
        pallas_packed_banded_attention(q, k, v, bad, scale=0.5)


def test_gate_model_packed_impl_matches_default():
    """GATE with attn_impl='pallas_packed' (the TPU 'auto' choice) routes
    through the packed kernel and matches the jnp banded default."""
    from sl_hwgat_tpu.models.gate import GATE

    kw = dict(kp_dim=2, num_kps=29, temporal_dim=8, num_classes=5,
              embed_dim=32, depths=2, num_heads=2, drop_rate=0.0)
    ref = GATE(**kw)
    fused = GATE(**kw, attn_impl="pallas_packed")
    x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 8, 29, 2)),
                    jnp.float32)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    want = ref.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_packed_bf16_forward_and_gradients_close_to_f32():
    """bf16 stream through the packed kernel (the TPU 'auto' path under
    --compute-dtype bfloat16): fwd + fused bwd track the f32 oracle within
    bf16 tolerance, and the dO stream is contracted in the stream dtype
    (ADVICE r4: no mixed-dtype dot_general in the backward)."""
    from sl_hwgat_tpu.ops.pallas_banded import pallas_packed_banded_attention

    vtok = 29
    f = 3 * 4  # Vp 32 → 4 frames per 128-token tile
    r = np.random.default_rng(11)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 2, f, vtok, 8)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, edges_to_dense(BODY29_EDGES, vtok, self_loops=False))
    want = banded_frame_attention(q, k, v, jnp.asarray(band), scale=0.25)
    got = pallas_packed_banded_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        band, scale=0.25)
    assert got.dtype == jnp.float32  # f32 accumulator output
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)

    def loss(q, k, v):
        return jnp.sum(banded_frame_attention(q, k, v, jnp.asarray(band),
                                              scale=0.25) ** 2)

    def loss_bf(q, k, v):
        return jnp.sum(pallas_packed_banded_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), band, scale=0.25) ** 2)

    g32 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gbf = jax.grad(loss_bf, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g32, gbf):
        assert np.isfinite(np.asarray(b)).all(), name
        denom = np.abs(np.asarray(a)).max() + 1e-6
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / denom < 0.1, name


def test_packed_mm_probe_is_host_gated_and_forward_only(monkeypatch):
    """PALLAS_BANDED_PACKED_MM=1 must select a DIFFERENT compiled kernel
    (host-side gate — a trace-time env read would silently reuse the stale
    cache) and must not differentiate (no custom_vjp pairing the probe
    forward with the real backward)."""
    from sl_hwgat_tpu.ops.pallas_banded import pallas_packed_banded_attention

    vtok, f = 29, 4
    r = np.random.default_rng(12)
    q, k, v = (
        jnp.asarray(r.normal(size=(1, 1, f, vtok, 8)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, edges_to_dense(BODY29_EDGES, vtok, self_loops=False))
    real = pallas_packed_banded_attention(q, k, v, band, scale=0.5)
    monkeypatch.setenv("PALLAS_BANDED_PACKED_MM", "1")
    probe = pallas_packed_banded_attention(q, k, v, band, scale=0.5)
    # the probe omits masking/softmax — a genuinely different program
    assert np.abs(np.asarray(probe) - np.asarray(real)).max() > 1e-3
    with pytest.raises(Exception):
        jax.grad(lambda qq: jnp.sum(pallas_packed_banded_attention(
            qq, k, v, band, scale=0.5)))(q)


def test_plane_api_matches_array_level():
    """`pallas_packed_banded_attention_planes` (the zero-pack entry) must
    equal the array-level call on pre-packed planes, fwd and grads."""
    from sl_hwgat_tpu.ops.pallas_banded import (
        pallas_packed_banded_attention, pallas_packed_banded_attention_planes)

    vtok, f, g, h, dh = 16, 8, 2, 2, 8  # V == Vp, F*V = 128
    r = np.random.default_rng(30)
    q, k, v = (
        jnp.asarray(r.normal(size=(g, h, f, vtok, dh)).astype(np.float32))
        for _ in range(3)
    )
    band = make_band(vtok, graphs.window_adj(window_size=16))

    def planes(x):
        return x.transpose(0, 1, 4, 2, 3).reshape(g * h, dh, f * vtok)

    # (G,H,F,V,dh) → (GH, dh, F·Vp): F,V contiguous in lane order
    def pack(x):
        return x.transpose(0, 1, 2, 3, 4).reshape(g, h, f * vtok, dh) \
                .transpose(0, 1, 3, 2).reshape(g * h, dh, f * vtok)

    want = pallas_packed_banded_attention(q, k, v, band, scale=0.25)
    got = pallas_packed_banded_attention_planes(
        pack(q), pack(k), pack(v), band, scale=0.25, vp=vtok, frames=f)
    got_arr = got.reshape(g, h, dh, f, vtok).transpose(0, 1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(got_arr), np.asarray(want), atol=2e-5)

    gw = jax.grad(lambda qq: jnp.sum(jnp.sin(
        pallas_packed_banded_attention(qq, k, v, band, scale=0.25))))(q)
    gp = jax.grad(lambda qq: jnp.sum(jnp.sin(
        pallas_packed_banded_attention_planes(
            pack(qq), pack(k), pack(v), band, scale=0.25, vp=vtok,
            frames=f))))(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gw), atol=3e-5)


def test_wgate_plane_path_matches_banded_default():
    """WGATE with attn_impl='pallas_packed' routes through the ZERO-PACK
    plane path (V=16 is lane-exact) — same logits and parameter gradients
    as the banded-XLA default, sharing one param tree."""
    from sl_hwgat_tpu.models.wgate import WGATE

    kw = dict(kp_dim=2, num_kps=64, temporal_dim=8, num_classes=5,
              embed_dim=32, depths=2, num_heads=2, window_size=16,
              drop_rate=0.0)
    ref = WGATE(**kw, attn_impl="banded")
    fused = WGATE(**kw, attn_impl="pallas_packed")
    x = jnp.asarray(np.random.default_rng(31).normal(size=(2, 8, 64, 2)),
                    jnp.float32)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    want = ref.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)

    def loss(model):
        return lambda p: jnp.sum(jnp.sin(
            model.apply({**variables, "params": p}, x, train=False)))

    gw = jax.grad(loss(ref))(variables["params"])
    gg = jax.grad(loss(fused))(variables["params"])
    for (pw, w), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(gw),
            jax.tree_util.tree_leaves_with_path(gg)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=5e-5,
                                   err_msg=jax.tree_util.keystr(pw))
