"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective logic is validated without TPU hardware, per SURVEY.md §4.3.
Must run before the first ``import jax`` anywhere in the test session.
"""

import os
import sys

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel, single
# client). Tests must never touch it: hard-force CPU before jax is imported.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# torch (CPU, used as parity oracle) must be imported before jax does real
# work: the reverse order deadlocks on this image's OpenMP runtimes.
import torch  # noqa: E402,F401

# The axon sitecustomize registers the TPU backend and overrides JAX_PLATFORMS
# via the config API, so the env var alone is not enough — override it back
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = "/root/reference/hwgat"


def make_timm_shim():
    """The reference models import ``timm`` only for ``trunc_normal_``.

    timm is not installed here; provide a minimal shim so the reference modules
    can be imported as numerical oracles in parity tests.
    """
    import types

    import torch

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(min=a * std + mean, max=b * std + mean)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", models)
    sys.modules.setdefault("timm.models.layers", layers)


def import_reference(module_name: str):
    """Import a module from the read-only reference checkout (oracle only)."""
    make_timm_shim()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import importlib

    return importlib.import_module(module_name)
