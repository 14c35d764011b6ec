"""Child process: end-to-end CLI training on the real TPU with the synthetic
dataset — validates the full stack (fused dual-mask kernel, tg16 default,
optional bf16 mixed precision, checkpointing) inside a real train run, not a
microbench. Prints one JSON line with losses and wall time.

Run as: python bench_e2e_tpu.py [f32|bf16] [epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "f32"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from sl_hwgat_tpu.cli import run
    from sl_hwgat_tpu.configs import RunConfig
    from sl_hwgat_tpu.data.synthetic import write_synthetic_dataset

    work = tempfile.mkdtemp(prefix="e2e_tpu_")
    write_synthetic_dataset(os.path.join(work, "input"))

    cfg = RunConfig(
        dataset="SYNTH", model_type="HWGATE", mode="train", time="bench",
        input_root=os.path.join(work, "input"),
        output_root=os.path.join(work, "output"),
    )
    cfg.epochs = epochs
    cfg.batch_size = 8
    cfg.n_workers = 2
    if dtype == "bf16":
        cfg.overrides = dict(cfg.overrides, compute_dtype="bfloat16")

    t0 = time.time()
    results, state = run(cfg, progress=False)
    wall = time.time() - t0
    print(json.dumps({
        "impl": f"e2e_tpu_{dtype}",
        "epochs": epochs,
        "wall_s": round(wall, 1),
        "train_loss": [round(float(x), 4) for x in state.history["train_loss"]],
        "val_loss": [round(float(x), 4) for x in state.history["val_loss"]],
        "test_loss": round(float(results["test"][0]), 4),
        "test_acc": round(float(results["test"][1]), 4),
    }))


if __name__ == "__main__":
    main()
