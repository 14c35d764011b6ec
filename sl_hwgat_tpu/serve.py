"""Production inference: checkpoint → compiled bucketed predictor.

The reference offers no serving path (training-script evaluation only,
`hwgat/utils.py:117-142`); this module is the deployment-facing API the
north star's "production serving" requirement implies:

- **one compile per bucket**: requests are padded to fixed (batch, frames)
  buckets so XLA compiles once per bucket and every later call is pure
  execution (dynamic shapes would retrace per request — pathological on TPU,
  doubly so through a remote-compile relay);
- **validity-masked batching**: short batches are padded with zero clips and
  the padded logits dropped, so odd-sized request batches never recompile;
- accepts raw keypoint clips (any frame count / the extractor's (F, K, C)
  layout) and applies the model family's EVAL transform — the same
  preprocessing the training pipeline used;
- checkpoints: ours (`.ckpt` pickle or Orbax dir) or the reference's `.pt`.

Usage::

    pred = Predictor.from_checkpoint("output/FDMSE/HWGATE_v1/model_best_loss.ckpt",
                                     model_type="HWGATE", dataset="FDMSE")
    out = pred.predict_topk([clip1, clip2], k=5)   # clips: (F_i, 543, 4) ndarrays
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from sl_hwgat_tpu.constants import DATASET_PARAMS
from sl_hwgat_tpu.models import build_model
from sl_hwgat_tpu.train.checkpoint import variables_from_source


@dataclass
class Predictor:
    """Compiled classifier over preprocessed keypoint clips."""

    model: object
    variables: dict
    transform: object
    num_classes: int
    batch_buckets: tuple = (1, 4, 16)
    _compiled: dict = field(default_factory=dict)

    @classmethod
    def from_checkpoint(cls, path: str, *, model_type: str, dataset: str,
                        pose_method: str = "mediapipe",
                        batch_buckets: tuple = (1, 4, 16), **model_overrides):
        from sl_hwgat_tpu import configs
        from sl_hwgat_tpu.data import transforms as T

        ds = DATASET_PARAMS[dataset]
        model = build_model(model_type, ds, 2, **model_overrides)
        variables = jax.tree.map(jnp.asarray,
                                 variables_from_source(path, model_type))
        # full raw-clip pipeline: the preprocess-time static transform
        # (extractor layout → selected kp/coords) chained with the model
        # family's eval transform — the exact training-time preprocessing.
        static = configs.build_static_transform(pose_method)
        if model_type in ("HWGATE", "WGATE"):
            ev = configs.build_eval_transform(ds["src_len"])
        else:
            ev = configs.build_skeleton_eval_transform(ds["src_len"])
        transform = T.Compose([*static.transforms, *ev.transforms])
        return cls(model=model, variables=variables, transform=transform,
                   num_classes=ds["num_class"], batch_buckets=tuple(batch_buckets))

    # -- compilation ---------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return int(np.ceil(n / self.batch_buckets[-1])) * self.batch_buckets[-1]

    def _fn(self, batch: int, sample_shape: tuple):
        key = (batch, sample_shape)
        if key not in self._compiled:
            @jax.jit
            def fwd(variables, x):
                return self.model.apply(variables, x, train=False)

            self._compiled[key] = fwd
        return self._compiled[key]

    # -- API -----------------------------------------------------------------
    @staticmethod
    def _payload(clip):
        """Accept a `data/pose_extract.py` payload dict, or a plain (F, K, C)
        array (assumed already in pixel space → unit video size)."""
        if isinstance(clip, dict):
            return {"feat": np.array(clip["feat"], np.float32, copy=True),
                    "vid_width": clip.get("vid_width", 1),
                    "vid_height": clip.get("vid_height", 1)}
        return {"feat": np.array(clip, np.float32, copy=True),
                "vid_width": 1, "vid_height": 1}

    def predict_logits(self, clips: Sequence) -> np.ndarray:
        """Raw keypoint clips (pose-extract payload dicts or (F_i, K, C)
        arrays) → (len(clips), num_classes) logits."""
        xs = [np.asarray(self.transform(self._payload(c)), np.float32)
              for c in clips]
        shape = xs[0].shape
        if any(x.shape != shape for x in xs):
            raise ValueError(f"transform produced inconsistent shapes: "
                             f"{[x.shape for x in xs]}")
        n = len(xs)
        b = self._bucket(n)
        x = np.zeros((b,) + shape, np.float32)
        x[:n] = np.stack(xs)
        logits = self._fn(b, shape)(self.variables, jnp.asarray(x))
        return np.asarray(logits)[:n]

    def predict_topk(self, clips: Sequence[np.ndarray], k: int = 5):
        """→ list of (class_ids, softmax_scores), each length k, per clip."""
        logits = self.predict_logits(clips)
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        idx = np.argsort(-logits, axis=-1)[:, :k]
        return [(idx[i], probs[i, idx[i]]) for i in range(len(clips))]

    def warmup(self, sample_clip) -> None:
        """Pre-compile every batch bucket (call once at service start)."""
        x = np.asarray(self.transform(self._payload(sample_clip)), np.float32)
        for b in self.batch_buckets:
            self._fn(b, x.shape)(
                self.variables,
                jnp.zeros((b,) + x.shape, jnp.float32),
            ).block_until_ready()

    # -- export ----------------------------------------------------------------
    def export_stablehlo(self, path: str, batch: int, sample_clip) -> str:
        """Serialize the compiled forward (weights baked in) as a portable
        StableHLO artifact (`jax.export`): servable from any JAX-compatible
        runtime without this package's model code. Returns the written path.

        The exported function takes ONE argument — the preprocessed batch
        ``(batch, *transform_output_shape) float32`` — and returns logits.
        """
        import jax.export as jex

        x = np.asarray(self.transform(self._payload(sample_clip)), np.float32)
        spec = jax.ShapeDtypeStruct((batch,) + x.shape, jnp.float32)

        variables = self.variables

        @jax.jit
        def fwd(xb):
            return self.model.apply(variables, xb, train=False)

        blob = jex.export(fwd)(spec).serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return path

    @staticmethod
    def load_exported(path: str):
        """Load a `export_stablehlo` artifact; returns a callable
        (batch, ...) float32 → logits."""
        import jax.export as jex

        with open(path, "rb") as f:
            exported = jex.deserialize(f.read())
        return lambda xb: exported.call(jnp.asarray(xb, jnp.float32))
