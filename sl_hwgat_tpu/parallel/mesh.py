"""Mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh
import numpy as np

AXES = ("dp", "sp", "tp")


def mesh_shape_for(n_devices: int) -> tuple[int, int, int]:
    """Reasonable default (dp, sp, tp) factorization of ``n_devices``.

    Preference order: give tp a small factor (2 if even), sp next, dp the rest
    — batch DP scales essentially linearly for this workload, so it takes the
    remainder.
    """
    tp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    rem = n_devices // tp
    sp = 2 if rem % 2 == 0 and rem >= 2 else 1
    dp = rem // sp
    return (dp, sp, tp)


def make_mesh(shape: tuple[int, int, int] | None = None, devices=None) -> Mesh:
    """Create a ('dp','sp','tp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = mesh_shape_for(len(devices))
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)
