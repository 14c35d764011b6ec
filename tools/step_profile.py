"""Op-level time breakdown of the flagship train step (jax.profiler + xprof).

Captures a device trace of a few compiled train steps and prints the top ops
by self time — the measured answer to "where does the step time above the
analytic roofline go" (bench.py step metric).

Run: python tools/step_profile.py [bf16|f32] [batch] [train|eval]
Env: SL_HWGAT_PRNG / PALLAS_ATTN_* knobs as in bench_train_step.py.
Prints one JSON line {"impl": "profile", "top": [[op, total_us, pct], ...]}.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _top_ops_from_trace(logdir: str, top_n: int = 25):
    """Parse the xplane proto and aggregate device op self-times."""
    from xprof.convert import raw_to_tool_data as conv

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None, "no xplane.pb produced"
    params = {"graph_viewer_options": {}}
    errs = []
    for tool in ("framework_op_stats^", "op_profile^", "hlo_op_stats^"):
        try:
            data, _ = conv.xspace_to_tool_data(paths, tool, params)
            return data, None
        except Exception as e:  # tool name varies across xprof versions
            errs.append(f"{tool}: {e}")
    return None, " / ".join(errs)


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    mode = sys.argv[3] if len(sys.argv) > 3 else "train"

    import jax

    if os.environ.get("SL_HWGAT_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["SL_HWGAT_PRNG"])
    import jax.numpy as jnp
    import numpy as np

    from sl_hwgat_tpu.models import build_model
    from sl_hwgat_tpu.train.loop import init_state, make_steps

    overrides = {} if dtype == "f32" else {"compute_dtype": "bfloat16"}
    ds = {"src_len": 192, "num_class": 2002}
    model = build_model("HWGATE", ds, 2, **overrides)

    class Cfg:
        seed = 0
        optimizer_type = "adamw"
        lr = 5e-4

    state, opt = init_state(model, Cfg, (192, 64, 2), ("dropout", "prune"))
    tstep, estep = make_steps(model, opt, rng_streams=("dropout", "prune"),
                              mutable_stats=False, donate=False)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(batch, 192, 64, 2)).astype(np.float32))
    y = jnp.asarray(r.integers(0, 2002, size=(batch,)).astype(np.int32))
    valid = jnp.ones((batch,), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables, opt_state = state.variables, state.opt_state

    def run_once(i=0):
        if mode == "eval":
            out = estep(variables, x, y, valid, 1)
            return float(out[0])
        out = tstep(variables, opt_state, x, y, valid, key, 0, i)
        return float(out[2])

    run_once()  # compile outside the trace

    logdir = tempfile.mkdtemp(prefix="steptrace_")
    jax.profiler.start_trace(logdir)
    for i in range(3):
        run_once(i)
    jax.profiler.stop_trace()

    data, err = _top_ops_from_trace(logdir)
    if data is None:
        print(json.dumps({"impl": "profile", "error": err}))
        return
    if isinstance(data, bytes):
        data = data.decode()
    parsed = json.loads(data)
    # gviz table: take device rows, top-N by total self time
    table = parsed[0]
    cols = [c["label"] for c in table["cols"]]
    i_dev = cols.index("Host/device")
    i_type = cols.index("Operation Type")
    i_name = cols.index("Operation Name")
    i_self = cols.index("Total self-time (us)")
    i_occ = cols.index("#Occurrences")
    i_bound = cols.index("Bound by")
    rows = []
    for r_ in table["rows"]:
        vals = [c.get("v") if isinstance(c, dict) else c for c in r_["c"]]
        if vals[i_dev] != "Device":
            continue
        rows.append([vals[i_type], str(vals[i_name])[:70], int(vals[i_occ] or 0),
                     round(float(vals[i_self] or 0), 1), vals[i_bound]])
    rows.sort(key=lambda r_: -r_[3])
    out_path = os.path.join(logdir, "op_stats.json")
    with open(out_path, "w") as f:
        json.dump(parsed, f)
    print(json.dumps({"impl": "profile", "mode": mode, "n_device_rows": len(rows),
                      "top": rows[:30], "logdir": logdir}))


if __name__ == "__main__":
    main()
