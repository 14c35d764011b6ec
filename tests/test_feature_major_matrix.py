"""Feature-major production-regime test matrix (VERDICT r4 item 4).

The feature-major stream (`models/hwgate.py::FMPartAttentionBlock`) is the
TPU production default; round 4 covered it with two f32 eval-mode tests only.
This matrix covers the regime that actually runs on-chip: FM × remat, FM ×
attention prune (train mode), FM × dropout (PRNG-stream equivalence is
statistical — the iid masks draw in different layouts), FM × bf16
compute+stream, FM at full flagship depth, and a matched-training protocol
run (token vs FM from identical init must track like the torch anchor did).

All tests run the Pallas wide kernel in interpreter mode on CPU; the same
code compiles via Mosaic on TPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.models.hwgate import HWGATE

KW = dict(kp_dim=2, temporal_dim=8, num_classes=6, embed_dim=32,
          depths=(2, 1), num_heads=(2, 2), drop_rate=0.0, prune_attn=False)


def _x(b=2, f=8, seed=50):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.normal(size=(b, f, 64, 2)).astype(np.float32))


def test_fm_remat_parity_fwd_and_grads():
    """FM × jax.checkpoint (the production remat path): forward and parameter
    gradients must equal the un-rematerialized token path."""
    tok = HWGATE(**KW)
    fm = HWGATE(**KW, stream_layout="feature", remat=True)
    x = _x(seed=51)
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)
    want = tok.apply(variables, x, train=False)
    got = fm.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss(model):
        return lambda p: jnp.sum(jnp.sin(
            model.apply({**variables, "params": p}, x, train=False)))

    gw = jax.grad(loss(tok))(variables["params"])
    gg = jax.grad(loss(fm))(variables["params"])
    for (pw, w), (_, g) in zip(
            jax.tree_util.tree_leaves_with_path(gw),
            jax.tree_util.tree_leaves_with_path(gg)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4,
                                   err_msg=jax.tree_util.keystr(pw))


def test_fm_prune_parity_train_mode():
    """Train-mode attention prune (`HWGATE.py:94-100` quirk): the per-call
    uniform draws from the 'prune' stream fold over identical module paths in
    both layouts, so token and FM must match ELEMENTWISE with prune active."""
    kw = dict(KW, prune_attn=True)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature")
    x = _x(seed=52)
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)
    base = tok.apply(variables, x, train=False)
    pruned_any = False
    for seed in range(6):  # parity must hold whatever the draws; at least
        rngs = {"prune": jax.random.PRNGKey(seed)}  # one seed must prune
        want = tok.apply(variables, x, train=True, rngs=rngs)
        got = fm.apply(variables, x, train=True, rngs=rngs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
        pruned_any |= bool(
            np.abs(np.asarray(want) - np.asarray(base)).max() > 1e-4)
    assert pruned_any


def test_fm_dropout_statistical_equivalence():
    """Dropout masks draw in different layouts ((g,n,d) vs (d,b,f,128)), so
    per-key outputs differ — but the masked logical tensor is iid-Bernoulli
    in both, so the OUTPUT DISTRIBUTION is identical. Check determinism per
    key and mean-equivalence over keys (3·SE bound)."""
    kw = dict(KW, drop_rate=0.3)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature")
    x = _x(seed=53)
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def run_tok(key):
        return tok.apply(variables, x, train=True, rngs={"dropout": key})

    @jax.jit
    def run_fm(key):
        return fm.apply(variables, x, train=True, rngs={"dropout": key})

    k0 = jax.random.PRNGKey(3)
    np.testing.assert_allclose(np.asarray(run_fm(k0)), np.asarray(run_fm(k0)))

    keys = jax.random.split(jax.random.PRNGKey(9), 48)
    s_tok = np.stack([np.asarray(run_tok(k)).mean() for k in keys])
    s_fm = np.stack([np.asarray(run_fm(k)).mean() for k in keys])
    se = np.sqrt(s_tok.var() / len(keys) + s_fm.var() / len(keys))
    assert abs(s_tok.mean() - s_fm.mean()) < 3 * se + 1e-6, (
        s_tok.mean(), s_fm.mean(), se)


def test_fm_bf16_compute_and_stream():
    """FM × bf16 compute + bf16 stream (the exact on-chip regime): tracks the
    f32 token path within bf16 tolerance, output dtype/finiteness held."""
    tok = HWGATE(**KW)
    fm = HWGATE(**KW, stream_layout="feature", compute_dtype="bfloat16")
    x = _x(seed=54)
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(tok.apply(variables, x, train=False))
    got = np.asarray(fm.apply(variables, x, train=False))
    assert np.isfinite(got).all()
    denom = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / denom < 0.1

    # gradients finite and tracking
    def loss(model):
        return lambda p: jnp.sum(jnp.sin(jnp.asarray(
            model.apply({**variables, "params": p}, x, train=False),
            jnp.float32)))

    gw = jax.tree.leaves(jax.grad(loss(tok))(variables["params"]))
    gg = jax.tree.leaves(jax.grad(loss(fm))(variables["params"]))
    # compare at the GLOBAL gradient scale: a leaf whose f32 gradient is
    # exactly zero (e.g. cancelling bias columns) would make a per-leaf
    # relative bound degenerate
    gscale = max(np.abs(np.asarray(w)).max() for w in gw)
    for w, g in zip(gw, gg):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < 0.15 * gscale


@pytest.mark.slow
def test_fm_full_flagship_depths():
    """FM at the FULL flagship topology (embed 128, depths (2,2,4), heads
    (2,4,8), two temporal merges, four shifted blocks) == token path."""
    kw = dict(kp_dim=2, temporal_dim=16, num_classes=10, embed_dim=128,
              depths=(2, 2, 4), num_heads=(2, 4, 8), drop_rate=0.0,
              prune_attn=False)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature")
    x = _x(f=16, seed=55)
    variables = tok.init(jax.random.PRNGKey(0), x, train=False)
    want = tok.apply(variables, x, train=False)
    got = fm.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="slow; set RUN_SLOW=1")
def test_fm_matched_training_tracks_token():
    """Matched-training protocol (COVERAGE.md anchor): token and FM models
    from IDENTICAL init, same batches, AdamW + cosine + smooth-CE, attention
    prune ON (the stream draws fold identically), dropout off (masks draw in
    different layouts — covered statistically above). Per-step losses must
    track to f32 noise, like the torch anchor did."""
    from sl_hwgat_tpu.train.loop import init_state, make_steps
    from sl_hwgat_tpu.train.state import make_optimizer

    kw = dict(KW, prune_attn=True)
    tok = HWGATE(**kw)
    fm = HWGATE(**kw, stream_layout="feature", remat=True)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    rngs = ("dropout", "prune")
    state_t, opt_t = init_state(tok, Cfg, (8, 64, 2), rngs)
    optimizer = make_optimizer("adamw", 5e-4)
    # identical init: FM shares the token param tree (same checkpoint)
    vars_t = state_t.variables
    train_t, _ = make_steps(tok, optimizer, "smooth_cross_entropy", rngs)
    train_f, _ = make_steps(fm, optimizer, "smooth_cross_entropy", rngs)

    r = np.random.default_rng(60)
    proto = r.normal(size=(6, 1, 64, 2)).astype(np.float32)
    vt, vf = vars_t, jax.tree.map(jnp.copy, vars_t)
    ot, of = state_t.opt_state, jax.tree.map(jnp.copy, state_t.opt_state)
    losses_t, losses_f = [], []
    key = jax.random.PRNGKey(1)
    for step in range(8):
        y = r.integers(0, 6, size=(4,))
        x = jnp.asarray(proto[y] + 0.3 * r.normal(size=(4, 8, 64, 2)), jnp.float32)
        yj = jnp.asarray(y, jnp.int32)
        valid = jnp.ones((4,), jnp.float32)
        vt, ot, lt, _, _ = train_t(vt, ot, x, yj, valid, key, step, 5e-4)
        vf, of, lf, _, _ = train_f(vf, of, x, yj, valid, key, step, 5e-4)
        losses_t.append(float(lt))
        losses_f.append(float(lf))
    np.testing.assert_allclose(losses_f, losses_t, rtol=2e-5, atol=2e-5)
    # and it actually trained
    assert losses_t[-1] < losses_t[0]
