"""Resident TPU experiment harness for kernel iteration (round-2 tooling).

The remote-compile relay wedges after ~1-2 compiles and needs ~10+ min idle to
recover, which makes one-process-per-experiment iteration hopeless. This
harness runs as ONE resident process working through a queue of experiments,
logging each result as it lands and sleeping between compiles to stay inside
the relay's budget.

Usage:
    python tools/tpu_lab.py plan.jsonl results.jsonl [--cooldown 60]

``plan.jsonl``: one experiment per line, e.g.
    {"name": "tg16",   "impl": "pallas", "env": {"PALLAS_ATTN_TG": "16"}}
    {"name": "fori8",  "impl": "pallas", "env": {"PALLAS_ATTN_FORI": "1"}}
    {"name": "bf16",   "impl": "pallas_bf16"}
    {"name": "mm",     "impl": "matmul_only"}

Each experiment runs in a subprocess (so a wedged compile is killed by
``--timeout`` without poisoning the harness) with the requested env overlay;
results append to ``results.jsonl`` immediately.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_experiment(exp: dict, timeout_s: int) -> dict:
    env = dict(os.environ)
    env.update(exp.get("env", {}))
    if "script" in exp:
        cmd = [sys.executable, os.path.join(REPO, exp["script"]),
               *[str(a) for a in exp.get("args", [])]]
    else:
        cmd = [sys.executable, os.path.join(REPO, "bench_kernel.py"),
               exp.get("impl", "pallas"), str(exp.get("units", 12288))]
    t0 = time.time()
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout_s, env=env)
    except subprocess.TimeoutExpired:
        return {"name": exp["name"], "status": "timeout", "wall_s": time.time() - t0}
    for line in out.stdout.splitlines():
        if line.strip().startswith("{"):
            rec = json.loads(line)
            rec.update({"name": exp["name"], "status": "ok", "wall_s": time.time() - t0})
            return rec
    return {"name": exp["name"], "status": "failed", "rc": out.returncode,
            "stderr_tail": (out.stderr or "").splitlines()[-25:],
            "wall_s": time.time() - t0}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("plan")
    p.add_argument("results")
    p.add_argument("--timeout", type=int, default=480)
    p.add_argument("--cooldown", type=int, default=60,
                   help="seconds to idle between experiments (relay recovery)")
    p.add_argument("--cooldown-after-wedge", type=int, default=600)
    args = p.parse_args()

    with open(args.plan) as f:
        plan = [json.loads(line) for line in f if line.strip()]

    for i, exp in enumerate(plan):
        print(f"[tpu_lab] {i + 1}/{len(plan)}: {exp['name']}", flush=True)
        rec = run_experiment(exp, args.timeout)
        with open(args.results, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[tpu_lab]   -> {rec}", flush=True)
        if i + 1 < len(plan):
            wait = args.cooldown_after_wedge if rec["status"] != "ok" else args.cooldown
            print(f"[tpu_lab] cooling down {wait}s", flush=True)
            time.sleep(wait)


if __name__ == "__main__":
    main()
