"""Fused Pallas attention vs the jnp stacked path: forward and gradients.
Runs in interpreter mode on CPU; compiled on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu import graphs
from sl_hwgat_tpu.graphs.skeleton import BODY29_EDGES
from sl_hwgat_tpu.ops.attention import stacked_window_attention
from sl_hwgat_tpu.ops.pallas_attention import pallas_window_attention


def qkv(u, n, dh, seed=0):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32)) for _ in range(3)
    )


ADJ32 = graphs.windowed_block_adj(2)[0]
ADJ58 = graphs.hgate_block_adj(BODY29_EDGES)


def test_forward_matches_stacked():
    q, k, v = qkv(16, 32, 64)
    got = pallas_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_padded_tokens():
    q, k, v = qkv(8, 58, 64, seed=1)
    got = pallas_window_attention(q, k, v, ADJ58, scale=0.1, stack=2, pad_tokens=64)
    want = stacked_window_attention(q, k, v, ADJ58, scale=0.1, stack=2, pad_tokens=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_prune():
    q, k, v = qkv(8, 32, 16, seed=2)
    got = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=0.05)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=0.05)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("prune_u", [None, 0.05])
def test_gradients_match(prune_u):
    q, k, v = qkv(8, 32, 16, seed=3)

    def loss_pallas(q, k, v):
        o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=prune_u)
        return jnp.sum(o * jnp.cos(o))

    def loss_stacked(q, k, v):
        o = stacked_window_attention(q, k, v, ADJ32, scale=0.25, stack=4, prune_u=prune_u)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_stacked, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)


def test_under_jit():
    q, k, v = qkv(16, 32, 64, seed=4)

    @jax.jit
    def f(q, k, v):
        return pallas_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)

    got = f(q, k, v)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.125, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _split_reference(q, k, v, adj, tail_adj, per_f, f, scale, stack):
    """Two-call split formulation (the pre-unification model path)."""
    u, n, dh = q.shape

    def split(t):
        t = t.reshape(-1, f, per_f, n, dh)
        return t[:, : f - 1].reshape(-1, n, dh), t[:, f - 1 :].reshape(-1, n, dh)

    (qm, qt), (km, kt), (vm, vt) = split(q), split(k), split(v)
    parts = []
    if f > 1:
        parts.append(
            stacked_window_attention(qm, km, vm, adj, scale=scale, stack=stack)
            .reshape(-1, f - 1, per_f, n, dh))
    parts.append(
        stacked_window_attention(qt, kt, vt, tail_adj, scale=scale, stack=stack)
        .reshape(-1, 1, per_f, n, dh))
    return jnp.concatenate(parts, axis=1).reshape(u, n, dh)


def _tail_setup(seed=5):
    # b=2 batch, f=3 temporal groups, per_f=8 units/group (nW=4 × h=2)
    per_f, f, b = 8, 3, 2
    q, k, v = qkv(b * f * per_f, 32, 16, seed=seed)
    r = np.random.default_rng(seed + 1)
    tail_adj = ADJ32 * (r.random(ADJ32.shape) > 0.3)  # arbitrary extra mask
    return q, k, v, tail_adj, per_f, f


def test_dual_mask_forward_matches_split():
    q, k, v, tail_adj, per_f, f = _tail_setup()
    got = pallas_window_attention(
        q, k, v, ADJ32, scale=0.25, stack=4,
        tail_adj=tail_adj, units_per_group=per_f, groups=f)
    want = _split_reference(q, k, v, ADJ32, tail_adj, per_f, f, 0.25, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_dual_mask_gradients_match_split():
    q, k, v, tail_adj, per_f, f = _tail_setup(seed=6)

    def loss_fused(q, k, v):
        o = pallas_window_attention(
            q, k, v, ADJ32, scale=0.25, stack=4,
            tail_adj=tail_adj, units_per_group=per_f, groups=f)
        return jnp.sum(o * jnp.cos(o))

    def loss_split(q, k, v):
        o = _split_reference(q, k, v, ADJ32, tail_adj, per_f, f, 0.25, 4)
        return jnp.sum(o * jnp.cos(o))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)


def test_dual_mask_rejects_straddling_supertiles():
    q, k, v = qkv(12, 32, 16, seed=7)
    with pytest.raises(Exception):
        pallas_window_attention(
            q, k, v, ADJ32, scale=0.25, stack=4,
            tail_adj=ADJ32, units_per_group=6, groups=2)


class TestTransposedLayout:
    """Transposed-layout kernel ((U, dh, N) operands, minor dim 128) must
    match the row-major kernel exactly — forward, dual-mask, prune, grads."""

    def _qkv(self, u=32, n=32, dh=16, seed=9):
        r = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32))
            for _ in range(3)
        )

    def test_forward_matches_rowmajor(self):
        q, k, v = self._qkv()
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=4, transposed=True)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)

    def test_dual_mask_and_prune_match(self):
        q, k, v = self._qkv(u=48, seed=10)
        r = np.random.default_rng(3)
        tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
        kw = dict(scale=0.25, stack=4, tail_adj=tail, units_per_group=8,
                  groups=3, prune_u=0.4)
        want = pallas_window_attention(q, k, v, ADJ32, **kw)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32,
            transposed=True, **kw)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)

    def test_gradients_match_rowmajor(self):
        q, k, v = self._qkv(seed=11)

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
            return jnp.sum(jnp.sin(o))

        def loss_t(qt, kt, vt):
            o = pallas_window_attention(qt, kt, vt, ADJ32, scale=0.25, stack=4,
                                        transposed=True)
            return jnp.sum(jnp.sin(jnp.swapaxes(o, 1, 2)))

        want = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got = jax.grad(loss_t, argnums=(0, 1, 2))(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)))
        for name, w, g in zip("qkv", want, got):
            np.testing.assert_allclose(
                np.asarray(jnp.swapaxes(g, 1, 2)), np.asarray(w), atol=2e-5,
                err_msg=name)

    def test_token_padding(self):
        # 24 tokens padded to 32 (HGATE-style): pad on the transposed minor dim
        q, k, v = self._qkv(n=24, seed=12)
        want = pallas_window_attention(q, k, v, ADJ32[:24, :24], scale=0.25,
                                       stack=4, pad_tokens=32)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32[:24, :24],
            scale=0.25, stack=4, pad_tokens=32, transposed=True)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)


class TestTransposedScore:
    """Transposed-SCORE kernel (``transposed="tscore"``: (U, dh, N) operands,
    Sᵀ in VMEM, sublane softmax) must match the row-major kernel exactly —
    forward, dual-mask, prune, grads, token padding."""

    def _qkv(self, u=32, n=32, dh=16, seed=9):
        r = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(r.normal(size=(u, n, dh)).astype(np.float32))
            for _ in range(3)
        )

    def test_forward_matches_rowmajor(self):
        q, k, v = self._qkv()
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=4, transposed="tscore")
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)

    def test_dual_mask_and_prune_match(self):
        q, k, v = self._qkv(u=48, seed=10)
        r = np.random.default_rng(3)
        tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
        kw = dict(scale=0.25, stack=4, tail_adj=tail, units_per_group=8,
                  groups=3, prune_u=0.4)
        want = pallas_window_attention(q, k, v, ADJ32, **kw)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32,
            transposed="tscore", **kw)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)

    def test_gradients_match_rowmajor(self):
        q, k, v = self._qkv(seed=11)

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
            return jnp.sum(jnp.sin(o))

        def loss_t(qt, kt, vt):
            o = pallas_window_attention(qt, kt, vt, ADJ32, scale=0.25, stack=4,
                                        transposed="tscore")
            return jnp.sum(jnp.sin(jnp.swapaxes(o, 1, 2)))

        want = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got = jax.grad(loss_t, argnums=(0, 1, 2))(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)))
        for name, w, g in zip("qkv", want, got):
            np.testing.assert_allclose(
                np.asarray(jnp.swapaxes(g, 1, 2)), np.asarray(w), atol=2e-5,
                err_msg=name)

    def test_token_padding(self):
        q, k, v = self._qkv(n=24, seed=12)
        want = pallas_window_attention(q, k, v, ADJ32[:24, :24], scale=0.25,
                                       stack=4, pad_tokens=32)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32[:24, :24],
            scale=0.25, stack=4, pad_tokens=32, transposed="tscore")
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want), atol=1e-5)

    def test_batched_variant_matches(self, monkeypatch):
        # PALLAS_ATTN_BATCHED=1 + tscore → _fwd/_bwd_kernel_ts_batched
        monkeypatch.setenv("PALLAS_ATTN_BATCHED", "1")
        q, k, v = self._qkv(seed=14)

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4,
                                        prune_u=0.4)
            return jnp.sum(jnp.sin(o))

        def loss_t(qt, kt, vt):
            o = pallas_window_attention(qt, kt, vt, ADJ32, scale=0.25, stack=4,
                                        prune_u=0.4, transposed="tscore")
            return jnp.sum(jnp.sin(jnp.swapaxes(o, 1, 2)))

        want, wg = jax.value_and_grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got, gg = jax.value_and_grad(loss_t, argnums=(0, 1, 2))(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)))
        # scalar loss sums 16k f32 terms — accumulation order differs
        np.testing.assert_allclose(float(got), float(want), atol=1e-3)
        for name, w, g in zip("qkv", wg, gg):
            np.testing.assert_allclose(
                np.asarray(jnp.swapaxes(g, 1, 2)), np.asarray(w), atol=2e-5,
                err_msg=name)

    def test_bf16_store_matches(self):
        q, k, v = self._qkv(seed=13)
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4,
                                       out_dtype=jnp.bfloat16)
        got = pallas_window_attention(
            *(jnp.swapaxes(t, 1, 2) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=4, out_dtype=jnp.bfloat16, transposed="tscore")
        # one bf16 ulp: the two schedules' f32 accumulations agree to ~2e-7
        # but can round to adjacent bf16 values on exact ties
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(got, 1, 2)).astype(np.float32),
            np.asarray(want).astype(np.float32), atol=4e-3)


@pytest.mark.slow
def test_full_model_tscore_layout_matches(monkeypatch):
    """PALLAS_ATTN_TRANSPOSED=tscore: the full HWGATE forward through the
    transposed-score kernel (incl. dual-mask stages) matches the default."""
    from sl_hwgat_tpu.models.hwgate import HWGATE

    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    r = np.random.default_rng(22)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("PALLAS_ATTN_TRANSPOSED", "tscore")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_full_model_wide_layout_matches(monkeypatch):
    """PALLAS_ATTN_TRANSPOSED=wide: the full HWGATE forward through the
    zero-relayout wide kernel (incl. dual-mask shifted stages) matches the
    default row-major path."""
    from sl_hwgat_tpu.models.hwgate import HWGATE

    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(2, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    r = np.random.default_rng(23)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("PALLAS_ATTN_TRANSPOSED", "wide")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_full_model_wide_layout_grads_match(monkeypatch):
    """Wide-layout gradients through the full model (train=True exercises the
    prune RNG + dropout paths off, dual-mask stages on) match the default."""
    from sl_hwgat_tpu.models.hwgate import HWGATE

    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(2, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    r = np.random.default_rng(24)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, xx):
        out = model.apply({**variables, "params": params}, xx, train=False)
        return jnp.sum(out * jnp.cos(out))

    want = jax.grad(loss)(variables["params"], x)
    monkeypatch.setenv("PALLAS_ATTN_TRANSPOSED", "wide")
    got = jax.grad(loss)(variables["params"], x)
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    for (pw, w), (pg, g) in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-4,
            err_msg=jax.tree_util.keystr(pw))


@pytest.mark.slow
def test_full_model_transposed_layout_matches(monkeypatch):
    """PALLAS_ATTN_TRANSPOSED=1: the full HWGATE forward through the
    transposed-layout kernel (incl. dual-mask stages) matches the default."""
    from sl_hwgat_tpu.models.hwgate import HWGATE

    model = HWGATE(
        kp_dim=2, temporal_dim=16, num_classes=6, embed_dim=32,
        depths=(1, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False,
        attn_impl="pallas",
    )
    r = np.random.default_rng(21)
    x = jnp.asarray(r.normal(size=(2, 16, 64, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, train=False)

    monkeypatch.setenv("PALLAS_ATTN_TRANSPOSED", "1")
    got = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_odd_supertile_count_no_tg1_cliff():
    """Prime supertile counts must pad to a full tile group instead of
    silently degrading to tg=1 (VERDICT r2 weak-5 / next-9)."""
    from sl_hwgat_tpu.ops.pallas_attention import _pick_tiles_per_step

    for t in (29, 31, 97, 3072, 24, 17 * 3):
        tg, t_pad = _pick_tiles_per_step(t, 128, 64)
        assert tg >= min(t, 8), (t, tg)
        assert t_pad % tg == 0 and t_pad >= t

    # full numerical parity at a prime supertile count (t = 29), fwd + grad
    u = 29 * 4
    q, k, v = qkv(u, 32, 16, seed=11)

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v, ADJ32, scale=0.25, stack=4)
            return jnp.sum(o * jnp.cos(o))
        return f

    got = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
    want = stacked_window_attention(q, k, v, ADJ32, scale=0.25, stack=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    g1 = jax.grad(loss(pallas_window_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(stacked_window_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"d{name}")


def test_odd_supertile_dual_mask():
    """Padded tiles must select the main mask (sel pads with zeros) and not
    perturb real units in shifted-block mode."""
    u, n, dh = 24, 32, 16  # t = 6 → divisor path; then force a padded case
    q, k, v = qkv(u, n, dh, seed=12)
    tail = np.asarray(ADJ32) * (np.arange(n)[:, None] % 2 == np.arange(n)[None, :] % 2)
    got = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=4,
                                  tail_adj=tail, units_per_group=12, groups=2)
    want = stacked_window_attention(q[:12], k[:12], v[:12], ADJ32, scale=0.25, stack=4)
    want_t = stacked_window_attention(q[12:], k[12:], v[12:], tail, scale=0.25, stack=4)
    np.testing.assert_allclose(np.asarray(got[:12]), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[12:]), np.asarray(want_t), atol=1e-5)


class TestWide:
    """Model-layout ("wide") kernel (``transposed="wide"``): q/k/v arrive as
    (H, DH, T_h, SN) — the pure view of the feature-major (h·dh, g, n)
    projection output with groups packed ``stack`` per supertile, units
    h-major. Must match the row-major kernel on the same units."""

    H, G, N, DH = 2, 12, 32, 16
    STACK = 4

    def _qkv(self, seed=30):
        r = np.random.default_rng(seed)
        return tuple(
            jnp.asarray(r.normal(
                size=(self.H * self.G, self.N, self.DH)).astype(np.float32))
            for _ in range(3)
        )

    def _widen(self, x):
        h, g, st, n, dh = (self.H, self.G, self.STACK, self.N, self.DH)
        return jnp.asarray(x).reshape(h, g // st, st, n, dh).transpose(
            0, 4, 1, 2, 3).reshape(h, dh, g // st, st * n)

    def _unwiden(self, y):
        h, g, st, n, dh = (self.H, self.G, self.STACK, self.N, self.DH)
        return y.reshape(h, dh, g // st, st, n).transpose(
            0, 2, 3, 4, 1).reshape(h * g, n, dh)

    def test_forward_matches_rowmajor(self):
        q, k, v = self._qkv()
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25,
                                       stack=self.STACK)
        got = pallas_window_attention(
            *(self._widen(t) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=self.STACK, transposed="wide")
        np.testing.assert_allclose(
            np.asarray(self._unwiden(got)), np.asarray(want), atol=1e-5)

    def test_dual_mask_and_prune_match(self):
        # per head row: 3 temporal groups of 4 groups → tail every 12 groups
        q, k, v = self._qkv(seed=31)
        r = np.random.default_rng(5)
        tail = ADJ32 * (r.random(ADJ32.shape) > 0.3)
        want = pallas_window_attention(
            q, k, v, ADJ32, scale=0.25, stack=self.STACK, tail_adj=tail,
            units_per_group=4, groups=3, prune_u=0.4)
        got = pallas_window_attention(
            *(self._widen(t) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=self.STACK, tail_adj=tail,
            units_per_group=4, groups=3, prune_u=0.4, transposed="wide")
        np.testing.assert_allclose(
            np.asarray(self._unwiden(got)), np.asarray(want), atol=1e-5)

    def test_gradients_match_rowmajor(self):
        q, k, v = self._qkv(seed=32)

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25,
                                        stack=self.STACK)
            return jnp.sum(jnp.sin(o))

        def loss_w(qw, kw, vw):
            o = pallas_window_attention(qw, kw, vw, ADJ32, scale=0.25,
                                        stack=self.STACK, transposed="wide")
            return jnp.sum(jnp.sin(self._unwiden(o)))

        want = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got = jax.grad(loss_w, argnums=(0, 1, 2))(
            *(self._widen(t) for t in (q, k, v)))
        for name, w, g in zip("qkv", want, got):
            np.testing.assert_allclose(
                np.asarray(self._unwiden(g)), np.asarray(w), atol=2e-5,
                err_msg=name)

    def test_bf16_store_matches(self):
        q, k, v = self._qkv(seed=33)
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25,
                                       stack=self.STACK, out_dtype=jnp.bfloat16)
        got = pallas_window_attention(
            *(self._widen(t) for t in (q, k, v)), ADJ32, scale=0.25,
            stack=self.STACK, out_dtype=jnp.bfloat16, transposed="wide")
        np.testing.assert_allclose(
            np.asarray(self._unwiden(got)).astype(np.float32),
            np.asarray(want).astype(np.float32), atol=4e-3)

    def test_odd_tile_count_pads(self):
        # Default tg heuristic at t_h=34 (G=136, stack 4) picks tg=16 →
        # t_pad=48 ≠ t_h: exercises the wide kernels' lane-axis pad + sel-pad
        # branches (_attention_fwd/_bwd) with NO TG override. (A TG override
        # divisor-rounds tg and never pads — the round-3 version of this test
        # silently tested the unpadded path.)
        h, g, st, n, dh = self.H, 136, self.STACK, self.N, self.DH
        r = np.random.default_rng(34)
        q, k, v = (
            jnp.asarray(r.normal(size=(h * g, n, dh)).astype(np.float32))
            for _ in range(3)
        )

        def widen(x):
            return jnp.asarray(x).reshape(h, g // st, st, n, dh).transpose(
                0, 4, 1, 2, 3).reshape(h, dh, g // st, st * n)

        def unwiden(y):
            return y.reshape(h, dh, g // st, st, n).transpose(
                0, 2, 3, 4, 1).reshape(h * g, n, dh)

        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=st)
        got = pallas_window_attention(
            *(widen(t) for t in (q, k, v)), ADJ32,
            scale=0.25, stack=st, transposed="wide")
        np.testing.assert_allclose(
            np.asarray(unwiden(got)), np.asarray(want), atol=1e-5)

        def loss_w(qw, kw, vw):
            o = pallas_window_attention(qw, kw, vw, ADJ32, scale=0.25,
                                        stack=st, transposed="wide")
            return jnp.sum(jnp.sin(unwiden(o)))

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25, stack=st)
            return jnp.sum(jnp.sin(o))

        want_g = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got_g = jax.grad(loss_w, argnums=(0, 1, 2))(
            *(widen(t) for t in (q, k, v)))
        for name, w, gg in zip("qkv", want_g, got_g):
            np.testing.assert_allclose(
                np.asarray(unwiden(gg)), np.asarray(w), atol=2e-5,
                err_msg=name)

    def test_batched_variant_matches(self, monkeypatch):
        # PALLAS_ATTN_BATCHED=1 + wide → _fwd/_bwd_kernel_wide_batched
        # (in-VMEM tile gather + one batched dot_general per block)
        q, k, v = self._qkv(seed=35)
        want = pallas_window_attention(q, k, v, ADJ32, scale=0.25,
                                       stack=self.STACK, prune_u=0.3)
        monkeypatch.setenv("PALLAS_ATTN_BATCHED", "1")

        def loss_w(qw, kw, vw):
            o = pallas_window_attention(qw, kw, vw, ADJ32, scale=0.25,
                                        stack=self.STACK, prune_u=0.3,
                                        transposed="wide")
            return o, jnp.sum(jnp.sin(self._unwiden(o)))

        got, _ = loss_w(*(self._widen(t) for t in (q, k, v)))
        np.testing.assert_allclose(
            np.asarray(self._unwiden(got)), np.asarray(want), atol=1e-5)

        def loss_rm(q, k, v):
            o = pallas_window_attention(q, k, v, ADJ32, scale=0.25,
                                        stack=self.STACK, prune_u=0.3)
            return jnp.sum(jnp.sin(o))

        want_g = jax.grad(loss_rm, argnums=(0, 1, 2))(q, k, v)
        got_g = jax.grad(lambda a, b, c: loss_w(a, b, c)[1],
                         argnums=(0, 1, 2))(
            *(self._widen(t) for t in (q, k, v)))
        for name, w, g in zip("qkv", want_g, got_g):
            np.testing.assert_allclose(
                np.asarray(self._unwiden(g)), np.asarray(w), atol=2e-5,
                err_msg=name)


def test_feature_major_stream_matches_token(monkeypatch):
    """The round-4 feature-major stream regime (stream_layout='feature':
    LN/FFN/residual on (d, b, f, 128), wide kernel consumed as a pure view)
    must match the token-major model with the SAME variables — including a
    shifted block and a temporal merge."""
    from sl_hwgat_tpu.models.hwgate import HWGATE

    kw = dict(kp_dim=2, temporal_dim=8, num_classes=6, embed_dim=32,
              depths=(2, 1), num_heads=(2, 2), drop_rate=0.0,
              prune_attn=False)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature")
    r = np.random.default_rng(40)
    x = jnp.asarray(r.normal(size=(2, 8, 64, 2)).astype(np.float32))
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)
    want = tok.apply(variables, x, train=False)
    got = fm.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_feature_major_stream_grads_match_token():
    from sl_hwgat_tpu.models.hwgate import HWGATE

    kw = dict(kp_dim=2, temporal_dim=8, num_classes=6, embed_dim=32,
              depths=(2, 1), num_heads=(2, 2), drop_rate=0.0,
              prune_attn=False)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature")
    r = np.random.default_rng(41)
    x = jnp.asarray(r.normal(size=(2, 8, 64, 2)).astype(np.float32))
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)

    def loss(model):
        def f(p, xx):
            out = model.apply({**variables, "params": p}, xx, train=False)
            return jnp.sum(jnp.sin(out))
        return f

    gw = jax.grad(loss(tok))(variables["params"], x)
    gg = jax.grad(loss(fm))(variables["params"], x)
    fw = jax.tree_util.tree_leaves_with_path(gw)
    fg = jax.tree_util.tree_leaves_with_path(gg)
    for (pw, w), (_, g) in zip(fw, fg):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4,
                                   err_msg=jax.tree_util.keystr(pw))
