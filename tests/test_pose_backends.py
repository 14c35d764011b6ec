"""Pose-backend logic tests with fake upstream objects (mediapipe/mmpose are
not installed in this image; the numpy assembly paths are what we own).

Covers reference semantics of `hwgat/pose_modules/Mediapipe.py:14-35`
(543-row layout, visibility defaults, zero-filled missing parts) and
`hwgat/pose_modules/DWPose.py:14-23` (score concat, zero fallback).
"""

import types

import numpy as np
import pytest

from sl_hwgat_tpu.data.pose import KEYPOINT_MODEL_DICT, load_pose_model
from sl_hwgat_tpu.data.pose.dwpose import Model as DWModel
from sl_hwgat_tpu.data.pose.mediapipe_backend import Model as MPModel


def _landmarks(n, x=0.25, vis=0.75):
    pts = [types.SimpleNamespace(x=x, y=0.5, z=0.0, visibility=vis) for _ in range(n)]
    return types.SimpleNamespace(landmark=pts)


def test_mediapipe_features_layout_and_visibility():
    results = types.SimpleNamespace(
        pose_landmarks=_landmarks(33, x=0.1, vis=0.6),
        face_landmarks=None,                      # undetected → zero block
        left_hand_landmarks=_landmarks(21, x=0.9),
        right_hand_landmarks=None,
    )
    feat = MPModel._features(results)
    assert feat.shape == (543, 4)
    # pose block keeps its true visibility
    assert np.allclose(feat[:33, 0], 0.1) and np.allclose(feat[:33, 3], 0.6)
    # undetected face / right hand are zero-filled
    assert not feat[33:501].any() and not feat[522:].any()
    # detected left hand: vis defaults to 1 (no per-point visibility)
    assert np.allclose(feat[501:522, 0], 0.9) and np.allclose(feat[501:522, 3], 1.0)


def test_mediapipe_all_missing_is_zero():
    results = types.SimpleNamespace(
        pose_landmarks=None, face_landmarks=None,
        left_hand_landmarks=None, right_hand_landmarks=None)
    feat = MPModel._features(results)
    assert feat.shape == (543, 4) and not feat.any()


def _dw_instance(keypoints, scores):
    """A DWModel without running mmpose __init__ (absent in this image)."""
    m = DWModel.__new__(DWModel)
    inst = types.SimpleNamespace(
        keypoints=keypoints, keypoint_scores=scores)
    result = types.SimpleNamespace(pred_instances=inst, img_shape=(48, 64))
    m._inference = lambda model, image: [result]
    m.model = None
    return m


def test_dwpose_concatenates_scores():
    kp = np.random.default_rng(0).uniform(size=(1, 133, 2)).astype(np.float32)
    sc = np.linspace(0, 1, 133, dtype=np.float32)[None]
    out, h, w = _dw_instance(kp, sc)(np.zeros((48, 64, 3), np.uint8))
    assert out.shape == (133, 3) and (h, w) == (48, 64)
    assert np.allclose(out[:, :2], kp[0]) and np.allclose(out[:, 2], sc[0])


def test_dwpose_zero_fallback_when_no_detection():
    out, _, _ = _dw_instance(np.zeros((1, 133, 2)), np.zeros((1, 133)))(
        np.zeros((48, 64, 3), np.uint8))
    assert out.shape == (133, 3) and not out.any()


def test_registry_shapes_match_reference():
    # ≡ reference `pose_modules/keypoint_extract_models.py:1-6`
    assert KEYPOINT_MODEL_DICT["mediapipe"]["shape"] == (543, 4)
    assert KEYPOINT_MODEL_DICT["dwpose"]["shape"] == (133, 3)
    assert KEYPOINT_MODEL_DICT["rtmwpose"]["shape"] == (133, 3)


@pytest.mark.parametrize("name", ["mediapipe", "dwpose", "rtmwpose"])
def test_load_pose_model_gives_actionable_error_without_deps(name):
    # Per-backend so one installed dep never masks the others' ImportError
    # messages; non-ImportError failures (e.g. deps present but checkpoint
    # missing) are skipped per backend, not failed.
    try:
        load_pose_model(name)
    except ImportError as e:
        assert "not installed" in str(e)
    except Exception as e:  # pragma: no cover - partially-installed deps
        pytest.skip(f"{name} deps partially installed: {type(e).__name__}: {e}")
    else:  # pragma: no cover - only if the heavy deps exist
        pytest.skip(f"{name} deps installed in this image")
