"""Child process: measure a full train step (fwd+bwd+AdamW) — or the eval
step with SL_HWGAT_STEP=eval — on the TPU at the FDMSE-ISL config and print
one JSON line {impl, time_us, clips_per_sec}.

Run as: python bench_train_step.py {f32|bf16} [batch]
Model via SL_HWGAT_MODEL (default HWGATE; GATE/WGATE give the in-model
verdict for the banded-family attn_impl default — VERDICT r4 item 2);
attn_impl via SL_HWGAT_ATTN_IMPL.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "f32"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax

    if os.environ.get("BENCH_NO_CACHE") != "1":
        # persistent compile cache (same rationale as bench_kernel.py: remote
        # relay compiles dominate child wall time and degrade in-session)
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if os.environ.get("SL_HWGAT_PRNG"):
        # threefry dropout-bit generation measured 33.5ms of the 152.7ms
        # step (tools/kernel_batch32); 'rbg' uses the TPU hardware RNG
        jax.config.update("jax_default_prng_impl", os.environ["SL_HWGAT_PRNG"])
    import jax.numpy as jnp
    import numpy as np

    from sl_hwgat_tpu.models import MODEL_NUM_KPS, MODEL_RNG_STREAMS, build_model
    from sl_hwgat_tpu.train.loop import init_state, make_steps

    model_name = os.environ.get("SL_HWGAT_MODEL", "HWGATE")
    overrides = {} if dtype == "f32" else {"compute_dtype": "bfloat16"}
    if os.environ.get("SL_HWGAT_ATTN_IMPL"):
        overrides["attn_impl"] = os.environ["SL_HWGAT_ATTN_IMPL"]
    if os.environ.get("SL_HWGAT_REMAT") == "1":
        overrides["remat"] = True
    # step-time decomposition ablations (tools/kernel_batch32):
    if os.environ.get("SL_HWGAT_DROP") is not None:
        overrides["drop_rate"] = float(os.environ["SL_HWGAT_DROP"])
    if os.environ.get("SL_HWGAT_PRUNE") == "0":
        overrides["prune_attn"] = False
    if os.environ.get("SL_HWGAT_PE") == "0":
        overrides["pe"] = False
    if os.environ.get("SL_HWGAT_STREAM"):
        overrides["stream_dtype"] = os.environ["SL_HWGAT_STREAM"]
    if os.environ.get("SL_HWGAT_STREAM_LAYOUT"):
        overrides["stream_layout"] = os.environ["SL_HWGAT_STREAM_LAYOUT"]
    if model_name not in ("HWGATE", "HGATE"):
        overrides.pop("remat", None)
        overrides.pop("prune_attn", None)
        overrides.pop("pe", None)
        overrides.pop("stream_dtype", None)
        overrides.pop("stream_layout", None)
    ds = {"src_len": 192, "num_class": 2002}  # FDMSE-ISL (constants.py)
    model = build_model(model_name, ds, 2, **overrides)
    kps = MODEL_NUM_KPS[model_name]
    streams = MODEL_RNG_STREAMS[model_name]

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, opt = init_state(model, Cfg, (192, kps, 2), streams)
    tstep, estep = make_steps(model, opt, rng_streams=streams,
                              mutable_stats=False, donate=False)

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(batch, 192, kps, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 2002, size=(batch,)).astype(np.int64))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)

    variables, opt_state = state.variables, state.opt_state

    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    if os.environ.get("SL_HWGAT_STEP") == "eval":
        out = estep(variables, x, y, valid, 1)
        float(out[0])
        steps = 20
        per = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for i in range(steps):
                out = estep(variables, x, y, valid, 1)
            float(out[0])
            per.append((time.perf_counter() - t0) / steps)
        per_step = statistics.median(per)
        print(json.dumps({
            "impl": f"{model_name}_eval_step_{dtype}",
            "time_us": per_step * 1e6,
            "time_us_min": min(per) * 1e6,
            "time_us_max": max(per) * 1e6,
            "n_repeats": repeats,
            "clips_per_sec": batch / per_step,
        }))
        return

    out = tstep(variables, opt_state, x, y, valid, key, 0, 0)
    variables, opt_state = out[0], out[1]
    # block_until_ready does NOT force completion through the axon relay;
    # materializing a scalar does (same reason bench_kernel uses float(sum)).
    float(out[2])
    float(jnp.sum(jax.tree.leaves(variables["params"])[0]))

    steps = 10
    per = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(steps):
            out = tstep(variables, opt_state, x, y, valid, key, 0, i)
            variables, opt_state = out[0], out[1]
        # forcing a param leaf covers the final optimizer update too
        float(jnp.sum(jax.tree.leaves(variables["params"])[0]))
        per.append((time.perf_counter() - t0) / steps)
    per_step = statistics.median(per)

    print(json.dumps({
        "impl": f"{model_name}_train_step_{dtype}",
        "time_us": per_step * 1e6,
        "time_us_min": min(per) * 1e6,
        "time_us_max": max(per) * 1e6,
        "n_repeats": repeats,
        "clips_per_sec": batch / per_step,
    }))


if __name__ == "__main__":
    main()
