"""Repro/regression probe for SPMD involuntary-full-remat warnings in the
multi-chip train/eval steps (VERDICT r2 item 2).

Runs the flagship HWGATE sharded train+eval step on a virtual (2,2,2) CPU
mesh with XLA's stderr captured at the fd level, and prints the number of
`Involuntary full rematerialization` warnings. Exit code 1 if any are found.
"""

from __future__ import annotations

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    import numpy as np

    from sl_hwgat_tpu.models.hwgate import HWGATE
    from sl_hwgat_tpu.parallel import make_mesh, make_sharded_steps
    from sl_hwgat_tpu.train.loop import init_state

    mesh = make_mesh((2, 2, 2), devices=jax.devices()[:8])
    frames, batch = 192, 2
    model = HWGATE(
        kp_dim=2, temporal_dim=frames, num_classes=2002, embed_dim=128,
        depths=(2, 2, 4), num_heads=(2, 4, 8), drop_rate=0.1,
        prune_attn=True, remat=True, attn_impl="pallas",
    )

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, optimizer = init_state(model, Cfg, (frames, 64, 2), ("dropout", "prune"))
    train_step, eval_step, vars_sh, opt_sh = make_sharded_steps(
        model, optimizer, mesh, state.variables, state.opt_state,
        rng_streams=("dropout", "prune"),
    )
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(batch, frames, 64, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 2002, size=(batch,)).astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)

    # Capture C++-level stderr (XLA spmd_partitioner warnings bypass Python's
    # sys.stderr) across the compiles.
    cap = tempfile.NamedTemporaryFile(mode="w+", delete=False, suffix=".log")
    saved = os.dup(2)
    os.dup2(cap.fileno(), 2)
    try:
        new_vars, new_opt, loss, _, _ = train_step(
            vars_sh, opt_sh, x, y, valid, key, 0, 0)
        float(loss)
        l2, _, _, _ = eval_step(new_vars, x, y, valid, 1)
        float(l2)
    finally:
        os.dup2(saved, 2)
        os.close(saved)
    cap.seek(0)
    lines = [ln for ln in cap.read().splitlines()
             if "Involuntary full rematerialization" in ln]
    os.unlink(cap.name)
    print(f"involuntary_full_remat_warnings={len(lines)}")
    for ln in lines:
        # keep only the op_name for readability
        i = ln.find("op_name=")
        print("  " + (ln[i:i + 90] if i >= 0 else ln[:120]))
    sys.exit(1 if lines else 0)


if __name__ == "__main__":
    main()
