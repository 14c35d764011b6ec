"""Pose-extraction backends behind a uniform duck-type:
``Model()(image) -> (keypoints (K, C), height, width)``.

≡ reference `hwgat/pose_modules/keypoint_extract_models.py:1-6`. Backends are
import-gated: mediapipe / mmpose are optional heavy dependencies.
"""

KEYPOINT_MODEL_DICT = {
    "dwpose": {"module": "sl_hwgat_tpu.data.pose.dwpose", "shape": (133, 3)},
    "rtmwpose": {"module": "sl_hwgat_tpu.data.pose.rtmwpose", "shape": (133, 3)},
    "mediapipe": {"module": "sl_hwgat_tpu.data.pose.mediapipe_backend", "shape": (543, 4)},
}


def load_pose_model(name: str, **kwargs):
    import importlib

    info = KEYPOINT_MODEL_DICT[name]
    mod = importlib.import_module(info["module"])
    return mod.Model(**kwargs), info["shape"]
