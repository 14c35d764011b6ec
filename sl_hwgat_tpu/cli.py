"""CLI entry — reference-compatible flags.

≡ reference `hwgat/main.py:7-85`:
``python -m sl_hwgat_tpu.cli -m {train|test|load} -d <dataset> --model <name>
[-t time] [-px postfix] [-mw weights] [-k topk] [-ft feature_type]``

Modes: ``train`` fresh run; ``load`` resume (or transfer when ``-mw`` is
given); ``test`` evaluation only. Every mode finishes with the final top-k
table and confusion CSV (`main.py:74-85`).
"""

from __future__ import annotations

import argparse

import numpy as np


def parser():
    p = argparse.ArgumentParser()
    p.add_argument("-d", "--dataset", type=str, required=True)
    p.add_argument("-m", "--mode", type=str, default="test", help="train, test, load")
    p.add_argument("-t", "--time", type=str, default="none")
    p.add_argument("-px", "--postfix", type=str, default="none")
    p.add_argument("-model", "--model", type=str, required=True)
    p.add_argument("-c", "--device", type=str, default="0", help="accepted for CLI parity; device choice is JAX-managed")
    p.add_argument("-ft", "--feature_type", type=str, default="keypoints")
    p.add_argument("-mw", "--model_weights", type=str, default="none")
    p.add_argument("-k", "--topk", type=int, default=1)
    p.add_argument("--epochs", type=int, default=None, help="override epoch count")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="override base learning rate (reference default 5e-4 "
                        "was tuned for batch 4; the SYNTH-2000 sweep showed "
                        "anything above it collapses to the uniform-logits "
                        "plateau — tools/largevocab_sweep_r05.md)")
    p.add_argument("--t-max", type=int, default=None,
                   help="cosine schedule period (reference default 20; torch "
                        "CosineAnnealingLR is PERIODIC, so lr rises again "
                        "after T_max epochs — set T_max=epochs for a single "
                        "decay)")
    p.add_argument("--trace", type=str, default=None,
                   help="capture a jax.profiler trace of the run into this directory")
    p.add_argument("--ckpt-backend", type=str, default="pickle",
                   choices=["pickle", "orbax"],
                   help="checkpoint backend: pickle (single file) or orbax "
                        "(async array I/O, multihost-safe)")
    p.add_argument("--attn-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="attention compute dtype (bfloat16 = fast path, f32-accumulated; "
                        "validated loss-equivalent on synthetic training)")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="mixed precision: bfloat16 runs every projection/FFN "
                        "matmul and the attention kernel in bf16 (params, "
                        "layernorm, softmax, head and loss stay f32)")
    p.add_argument("--stream-dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="residual-stream dtype between blocks (HWGATE): "
                        "bfloat16 halves the HBM bytes of every pass over "
                        "the (B,F,K,D) stream; LN stats stay f32")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize attention blocks in backward "
                        "(less activation HBM, ~1 extra forward of FLOPs)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "update (large effective batch at microbatch memory)")
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "stacked", "pallas", "hybrid",
                            "pallas_banded", "pallas_packed", "banded",
                            "compact", "ell"],
                   help="attention path: auto (pallas on TPU, stacked "
                        "elsewhere), stacked (jnp/XLA), pallas (fully-fused "
                        "kernel), hybrid (XLA GEMMs + fused masked-softmax); "
                        "banded/compact/ell/pallas_banded/pallas_packed "
                        "select the WGATE/GATE banded-family formulation")
    p.add_argument("--prng", type=str, default="auto",
                   choices=["auto", "threefry2x32", "rbg", "unsafe_rbg"],
                   help="PRNG implementation for dropout/prune keys. auto = "
                        "rbg on TPU (hardware RNG: threefry dropout-bit "
                        "generation measured 33.5ms of a 152.7ms flagship "
                        "train step, rbg recovers 25ms — "
                        "tools/kernel_batch32/33), threefry elsewhere")
    return p.parse_args()


def configure_prng(choice: str = "auto") -> None:
    """Select the PRNG implementation (see --prng). Must run before the
    first key creation."""
    import jax

    if choice == "auto":
        try:
            choice = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        except Exception:
            return
    jax.config.update("jax_default_prng_impl", choice)


def run(cfg, progress=True):
    """Full train/test flow for a RunConfig. Returns final results dict."""
    import os

    import jax

    configure_prng(getattr(cfg, "prng", "auto"))
    if os.environ.get("SL_HWGAT_NO_COMPILE_CACHE") != "1":
        # persistent compile cache: a re-launch of the same config costs
        # seconds instead of minutes of (remote) XLA compilation
        try:
            jax.config.update("jax_compilation_cache_dir", os.path.join(
                os.path.expanduser("~"), ".cache", "sl_hwgat_tpu_xla"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass

    from sl_hwgat_tpu.data.dataset import get_loaders
    from sl_hwgat_tpu.models import MODEL_NUM_KPS, MODEL_RNG_STREAMS, build_model
    from sl_hwgat_tpu.train import checkpoint as ckpt_lib
    from sl_hwgat_tpu.train.loop import (
        EarlyStopper,
        evaluate,
        init_state,
        make_steps,
        predictions_plus_true,
        run_epochs,
    )
    from sl_hwgat_tpu.train.reporting import gen_cm_w, read_class_map, show_final_result

    np.random.seed(cfg.seed)

    from sl_hwgat_tpu.models import MODEL_REGISTRY

    if cfg.model_type not in MODEL_REGISTRY:
        raise SystemExit(
            f"unknown model '{cfg.model_type}'; choose from: {', '.join(sorted(MODEL_REGISTRY))}"
        )
    model = build_model(cfg.model_type, cfg.dataset_params, cfg.input_dim, **cfg.overrides)
    num_kps = MODEL_NUM_KPS[cfg.model_type]
    rng_streams = MODEL_RNG_STREAMS[cfg.model_type]
    has_bn = cfg.model_type in ("STGCN", "DecoupledGCN")

    sample_shape = (cfg.src_len, num_kps, cfg.input_dim)
    state, optimizer = init_state(model, cfg, sample_shape, rng_streams)
    n_params = sum(np.prod(np.shape(p)) for p in jax.tree.leaves(state.variables["params"]))
    print("total trainable params :", int(n_params))

    train_step, eval_step = make_steps(
        model, optimizer, cfg.criterion_type, rng_streams, mutable_stats=has_bn,
        grad_accum=getattr(cfg, "grad_accum", 1) if cfg.mode in ("train", "load") else 1,
    )

    if cfg.mode in ("train", "load"):
        train_loader, val_loader, test_loader = get_loaders(
            cfg, cfg.train_transform(), cfg.eval_transform()
        )
        cfg.ensure_out_folder()
        ckpt_lib.save_experiment_snapshot(cfg)
        if cfg.mode == "load":
            if cfg.model_weights:
                state = ckpt_lib.load_pretrained_into(state, cfg.model_weights, cfg.model_type)
            else:
                state = ckpt_lib.resume_from(state, f"{cfg.save_model_path}_{cfg.postfix}.ckpt")
        stopper = EarlyStopper(cfg.early_stopping_step, 0) if cfg.early_stopping else None

        def report(epoch, metrics):
            if progress:
                print(
                    f"epoch {epoch:4d} | tr_ls {metrics['train_loss']:5.2f} "
                    f"tr_ac {metrics['train_acc']:.4f} | v_ls {metrics['val_loss']:5.2f} "
                    f"v_ac {metrics['val_acc']:.4f} | min_v_ls {metrics['best_val_loss']:.4f}"
                )

        state = run_epochs(
            model, cfg, state, train_step, eval_step, train_loader, val_loader,
            early_stopper=stopper, progress=report,
        )

    # final evaluation on the best checkpoint (≡ main.py:74-85)
    cfg.mode = "test"
    train_loader, val_loader, test_loader = get_loaders(
        cfg, cfg.eval_transform(), cfg.eval_transform()
    )
    best = f"{cfg.save_model_path}_{cfg.postfix}.ckpt"
    try:
        state.variables = ckpt_lib.read_checkpoint(best)["variables"]
    except FileNotFoundError:
        if cfg.model_weights:
            state = ckpt_lib.load_pretrained_into(state, cfg.model_weights, cfg.model_type)
        else:
            print(f"[cli] no checkpoint at {best}; evaluating current weights")
    results = {
        split: evaluate(eval_step, state, loader, k=cfg.topk)
        for split, loader in (("train", train_loader), ("val", val_loader), ("test", test_loader))
    }
    show_final_result(results, cfg.topk)
    try:
        class_map = read_class_map(cfg.data.class_map_path)
        y_pred, y_true = predictions_plus_true(eval_step, state, test_loader)
        cfg.ensure_out_folder()
        gen_cm_w(y_true, y_pred, class_map, cfg.save_cm_path)
    except FileNotFoundError:
        pass
    return results, state


def main():
    from sl_hwgat_tpu.configs import RunConfig

    args = parser()
    cfg = RunConfig(
        dataset=args.dataset,
        model_type=args.model,
        mode=args.mode,
        feature_type=args.feature_type,
        time=args.time,
        postfix=args.postfix,
        model_weights=args.model_weights,
        topk=args.topk,
    )
    if args.epochs is not None:
        cfg.epochs = args.epochs
    if args.batch_size is not None:
        cfg.batch_size = args.batch_size
    if args.lr is not None:
        cfg.lr = args.lr
    if args.t_max is not None:
        cfg.scheduler_t_max = args.t_max
    cfg.ckpt_backend = args.ckpt_backend
    cfg.grad_accum = args.grad_accum
    if args.attn_dtype != "float32" and cfg.model_type in ("HWGATE", "HGATE"):
        cfg.overrides = dict(cfg.overrides, attn_dtype=args.attn_dtype)
    if args.compute_dtype != "float32" and cfg.model_type in ("HWGATE", "HGATE", "WGATE", "GATE", "Transformer"):
        cfg.overrides = dict(cfg.overrides, compute_dtype=args.compute_dtype)
    if args.attn_impl != "auto" and cfg.model_type in ("HWGATE", "HGATE"):
        cfg.overrides = dict(cfg.overrides, attn_impl=args.attn_impl)
    if args.stream_dtype != "auto" and cfg.model_type == "HWGATE":
        cfg.overrides = dict(cfg.overrides, stream_dtype=args.stream_dtype)
    if (args.attn_impl in ("pallas_banded", "pallas_packed", "banded",
                           "compact", "ell")
            and cfg.model_type in ("WGATE", "GATE")):
        cfg.overrides = dict(cfg.overrides, attn_impl=args.attn_impl)
    cfg.prng = args.prng
    if args.remat and cfg.model_type in ("HWGATE", "HGATE"):
        cfg.overrides = dict(cfg.overrides, remat=True)
    print(cfg.dataset)
    print("Model Name:-", cfg.save_model_path)
    print("Running Mode:-", cfg.mode)
    if args.trace:
        from sl_hwgat_tpu.utils.profiling import trace

        with trace(args.trace):
            run(cfg)
    else:
        run(cfg)


if __name__ == "__main__":
    main()
