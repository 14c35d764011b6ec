"""Run configuration — mirrors the reference 3-level config
(`hwgat/configs.py:10-143`) with the same defaults, knobs, and output-artifact
contract, expressed as dataclasses instead of class-attribute soup.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from sl_hwgat_tpu.constants import (
    ANCHOR_POINTS,
    COORD_LIST,
    DATASET_PARAMS,
    INPUT_DIM,
    KP_LIST,
    LEFT_HAND_SLICE,
    ORIGIN_IDX,
    RIGHT_HAND_SLICE,
)
from sl_hwgat_tpu.data import transforms as T

# Augmentation knobs ≡ `configs.py:14-26`
FRAME_AUGMENTATION = (0.5, 1.5)
SAMPLING_PROB = 0.2
SHEAR_STD = 0.1
ROTATION_STD = 0.1


def build_train_transform(src_len: int, feature_type: str = "keypoints") -> T.Compose:
    """≡ `configs.py:93-103`."""
    return T.Compose(
        [
            T.KeypointMasking(SAMPLING_PROB, LEFT_HAND_SLICE[0], RIGHT_HAND_SLICE[1]),
            T.HandCorrection(LEFT_HAND_SLICE, RIGHT_HAND_SLICE),
            T.NormalizeKeypoints(ORIGIN_IDX, ANCHOR_POINTS),
            T.ShearTransform(SHEAR_STD),
            T.RotationTransform(ROTATION_STD),
            T.TemporalAugmentation(FRAME_AUGMENTATION, uniform_sample=True, random_sample=True),
            T.TemporalSample(src_len, random_shift=True),
            T.RandomFlip(feature_type),
            T.WindowCreate(src_len),
        ]
    )


def build_eval_transform(src_len: int) -> T.Compose:
    """≡ `configs.py:105-109`."""
    return T.Compose(
        [
            T.HandCorrection(LEFT_HAND_SLICE, RIGHT_HAND_SLICE),
            T.NormalizeKeypoints(ORIGIN_IDX, ANCHOR_POINTS),
            T.TemporalSample(src_len),
            T.WindowCreate(src_len),
        ]
    )


def build_skeleton_eval_transform(src_len: int) -> T.Compose:
    """Eval pipeline WITHOUT WindowCreate for the 29-joint models
    (GATE/HGATE/STGCN/DecoupledGCN/Transformer consume the raw skeleton)."""
    return T.Compose(
        [
            T.HandCorrection(LEFT_HAND_SLICE, RIGHT_HAND_SLICE),
            T.NormalizeKeypoints(ORIGIN_IDX, ANCHOR_POINTS),
            T.TemporalSample(src_len),
        ]
    )


def build_skeleton_train_transform(src_len: int, feature_type: str = "keypoints") -> T.Compose:
    """Train pipeline without WindowCreate (29-joint models)."""
    c = build_train_transform(src_len, feature_type)
    return T.Compose(c.transforms[:-1])


def build_static_transform(pose_method: str, input_type: str = "kp2D") -> T.Compose:
    """Preprocess-time transform (≡ `configs.py:41-42`)."""
    proc = T.DWPoseDataProcess() if pose_method == "dwpose" else T.MediapipeDataProcess()
    return T.Compose([proc, T.PoseSelect(KP_LIST[pose_method], COORD_LIST[pose_method + input_type])])


@dataclass
class DataConfig:
    """Paths for the four preprocessed artifacts (≡ `configs.py:34-49`)."""

    dataset_name: str
    feature_type: str = "keypoints"
    input_root: str = "input"

    @property
    def class_map_path(self):
        return f"{self.input_root}/{self.dataset_name}/class_map_{self.dataset_name}.csv"

    @property
    def vid_split_path(self):
        return f"{self.input_root}/{self.dataset_name}/vid_splits_{self.dataset_name}.pkl"

    @property
    def vid_class_path(self):
        return f"{self.input_root}/{self.dataset_name}/vid_class_{self.dataset_name}.pkl"

    @property
    def data_map_path(self):
        return (
            f"{self.input_root}/{self.dataset_name}/"
            f"data_map_{self.dataset_name}_{self.feature_type}.pkl"
        )


@dataclass
class RunConfig:
    """≡ `runCFG` (`configs.py:52-143`)."""

    dataset: str
    model_type: str = "HWGATE"
    mode: str = "train"            # train | test | load
    feature_type: str = "keypoints"
    input_type: str = "kp2D"
    time: str = "none"
    postfix: str = "none"
    model_weights: str | None = None
    topk: int = 1

    seed: int = 1001               # ≡ configs.py:55-59
    criterion_type: str = "smooth_cross_entropy"
    optimizer_type: str = "adamw"
    scheduler: str = "CosineAnnealingLR"
    scheduler_t_max: int = 20
    early_stopping: bool = False
    early_stopping_step: int = 400

    lr: float = 5e-4
    start_epoch: int = 0
    epochs: int = 500
    batch_size: int = 4
    n_workers: int = 8
    save_interval: int = 100

    input_root: str = "input"
    output_root: str = "output"
    ckpt_backend: str = "pickle"   # 'pickle' (single file) | 'orbax' (async)
    grad_accum: int = 1            # microbatches per optimizer update

    # overridden in tests / small runs
    overrides: dict = field(default_factory=dict)

    def __post_init__(self):
        ds = DATASET_PARAMS[self.dataset]
        self.src_len = ds["src_len"]
        self.num_class = ds["num_class"]
        self.input_dim = INPUT_DIM[self.input_type]
        self.dataset_params = ds
        if self.time == "none":
            self.time = datetime.now().strftime("%Y%m%d_%H%M")[2:]
        if self.postfix == "none":
            self.postfix = "best_loss"
        if self.model_weights == "none":
            self.model_weights = None
        self.data = DataConfig(self.dataset, self.feature_type, self.input_root)

    # --- transforms (windowed vs raw-skeleton models) -----------------------
    @property
    def uses_windowed_layout(self) -> bool:
        from sl_hwgat_tpu.models import MODEL_NUM_KPS

        return MODEL_NUM_KPS[self.model_type] == 64

    def train_transform(self):
        if self.uses_windowed_layout:
            return build_train_transform(self.src_len, self.feature_type)
        return build_skeleton_train_transform(self.src_len, self.feature_type)

    def eval_transform(self):
        if self.uses_windowed_layout:
            return build_eval_transform(self.src_len)
        return build_skeleton_eval_transform(self.src_len)

    # --- output artifact paths (≡ configs.py:133-143) -----------------------
    @property
    def save_suffix(self):
        return f"{self.model_type}_{self.time}"

    @property
    def out_folder(self):
        return f"{self.output_root}/{self.dataset}/{self.save_suffix}"

    @property
    def save_config_path(self):
        return f"{self.out_folder}/config.pkl"

    @property
    def save_model_path(self):
        return f"{self.out_folder}/model"

    @property
    def save_cm_path(self):
        return f"{self.out_folder}/cm_list_w.csv"

    @property
    def save_loss_curve_path(self):
        return f"{self.out_folder}/loss_curve.png"

    @property
    def save_acc_curve_path(self):
        return f"{self.out_folder}/acc_curve.png"

    def ensure_out_folder(self):
        os.makedirs(self.out_folder, exist_ok=True)
        return self.out_folder
