"""Numerical debugging aids (SURVEY.md §5: the reference has no sanitizers;
here NaN detection and jit-purity checks are first-class).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_checks():
    """Raise on NaN production inside jitted code (jax debug_nans)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite_tree(tree, name: str = "tree"):
    """Host-side check that every leaf of a pytree is finite."""
    bad = []

    def check(path, leaf):
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            bad.append("/".join(str(getattr(k, "key", k)) for k in path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def check_jit_purity(fn, *args, **kwargs):
    """Trace ``fn`` twice and verify identical jaxprs — catches Python-side
    state leaking into traced code (the moral equivalent of a race detector
    for the XLA execution model).

    Each trace goes through a fresh wrapper object: jax caches tracing per
    function identity, which would otherwise hide the second trace."""
    j1 = jax.make_jaxpr(lambda *a, **k: fn(*a, **k))(*args, **kwargs)
    j2 = jax.make_jaxpr(lambda *a, **k: fn(*a, **k))(*args, **kwargs)
    if str(j1) != str(j2):
        raise RuntimeError("fn traces to different jaxprs on repeated tracing — "
                           "impure capture of Python state")
    return j1
