"""Transform library golden tests vs the reference `dataTransform.py`.

Deterministic transforms are compared exactly; stochastic ones are checked by
injecting controlled randomness or verifying structural invariants."""

import numpy as np
import pytest

from tests.conftest import import_reference

from sl_hwgat_tpu.data import transforms as T


@pytest.fixture(scope="module")
def ref():
    return import_reference("dataTransform")


def clip(seed=0, t=20, v=29, c=2, zero_hands=False):
    r = np.random.default_rng(seed)
    x = r.uniform(0.1, 0.9, size=(t, v, c)).astype(np.float32)
    if zero_hands:
        x[3:7, 9:19] = 0.0   # left-hand gap
        x[0:2, 19:29] = 0.0  # leading right-hand gap
    return x


def test_pose_select(ref):
    from sl_hwgat_tpu.constants import COORD_LIST, KP_LIST

    x = np.random.default_rng(1).normal(size=(5, 543, 4)).astype(np.float32)
    want = ref.PoseSelect(KP_LIST["mediapipe"], COORD_LIST["mediapipekp2D"])(x.copy())
    got = T.PoseSelect(KP_LIST["mediapipe"], COORD_LIST["mediapipekp2D"])(x.copy())
    np.testing.assert_array_equal(got, want)
    assert got.shape == (5, 29, 2)


def test_mediapipe_process(ref):
    x = np.random.default_rng(2).uniform(size=(5, 543, 4)).astype(np.float32)
    d1 = {"feat": x.copy(), "vid_width": 640, "vid_height": 480}
    d2 = {"feat": x.copy(), "vid_width": 640, "vid_height": 480}
    np.testing.assert_array_equal(T.MediapipeDataProcess()(d1), ref.MediapipeDataProcess()(d2))


def test_normalize_keypoints(ref):
    x = clip(3)
    want = ref.NormalizeKeypoints(0, [3, 4])(x.copy())
    got = T.NormalizeKeypoints(0, [3, 4])(x.copy())
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_hand_correction(ref):
    x = clip(4, zero_hands=True)
    want = ref.HandCorrection([9, 19, 7], [19, 29, 8])(x.copy())
    got = T.HandCorrection((9, 19, 7), (19, 29, 8))(x.copy())
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temporal_sample_pad_and_downsample(ref):
    short = clip(5, t=10)
    np.testing.assert_array_equal(
        T.TemporalSample(16)(short.copy()), ref.TemporalSample(16)(short.copy())
    )
    long = clip(6, t=40)
    np.testing.assert_array_equal(
        T.TemporalSample(16)(long.copy()), ref.TemporalSample(16)(long.copy())
    )


def test_window_create(ref):
    x = clip(7, t=16)
    np.testing.assert_array_equal(T.WindowCreate(16)(x.copy()), ref.WindowCreate(16)(x.copy()))


def test_valid_frames(ref):
    x = clip(8).astype(np.float64)
    x[2, 5, 0] = 1.5  # out of range
    np.testing.assert_array_equal(T.ValidFrames()(x.copy()), ref.ValidFrames()(x.copy()))


def test_shear_structure():
    """The reference shear sets S[0][1]=m under row-vector matmul, so x stays
    fixed and y gains a term linear in (x - origin_x). Recover it exactly."""
    x = clip(9)
    got = T.ShearTransform(0.3)(x.copy(), np.random.default_rng(0))
    np.testing.assert_allclose(got[:, :, 0], x[:, :, 0], atol=1e-6)
    dy = (got[:, :, 1] - x[:, :, 1]).ravel()
    # y' - y = (x - ox) * m → exact affine relation in x
    coef = np.linalg.lstsq(
        np.stack([x[:, :, 0].ravel(), np.ones_like(dy)], axis=1), dy, rcond=None
    )[0]
    pred = x[:, :, 0].ravel() * coef[0] + coef[1]
    np.testing.assert_allclose(pred, dy, atol=1e-5)


def test_rotation_preserves_distances():
    x = clip(10)
    got = T.RotationTransform(0.3)(x.copy(), np.random.default_rng(1))
    d_before = np.linalg.norm(x[0, 1] - x[0, 2])
    d_after = np.linalg.norm(got[0, 1] - got[0, 2])
    np.testing.assert_allclose(d_before, d_after, atol=1e-5)


def test_keypoint_masking_fraction():
    x = clip(11, t=30)
    got = T.KeypointMasking(0.2, 9, 29)(x.copy(), np.random.default_rng(2))
    zeroed = [(got[t, 9:29] == 0).all() for t in range(30)]
    assert sum(zeroed) == 6  # int(0.2 * 30)


def test_temporal_augmentation_bounds():
    x = clip(12, t=30)
    for seed in range(5):
        out = T.TemporalAugmentation((0.5, 1.5), True, True)(x.copy(), np.random.default_rng(seed))
        assert 15 <= out.shape[0] <= 45


def test_random_flip():
    x = clip(13)
    flipped = T.RandomFlip()(x.copy(), np.random.default_rng(0))  # uniform() ≤ .5 path varies
    assert flipped.shape == x.shape
    # either identical or exactly mirrored
    same = np.allclose(flipped, x)
    mirrored = np.allclose(flipped[:, :, 0], 1 - x[:, :, 0])
    assert same or mirrored


def test_dwpose_process_golden(ref):
    r = np.random.default_rng(21)
    feat = r.uniform(0.1, 0.9, size=(12, 133, 3)).astype(np.float32)
    # wrists near the bottom edge in some frames; low visibility in others
    feat[2:5, 9, 1] = 0.99
    feat[6:9, 10, 1] = 0.98
    feat[0:3, 9, 2] = 0.1
    feat[9:12, 10, 2] = 0.2
    want = ref.DWPoseDataProcess()({"feat": feat.copy()})
    got = T.DWPoseDataProcess()({"feat": feat.copy()})
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_eval_pipeline_golden_vs_reference(ref):
    """The full deterministic eval pipeline (HandCorrection → Normalize →
    TemporalSample → WindowCreate) matches the reference Compose exactly —
    this is the tensor every eval forward pass consumes."""
    from sl_hwgat_tpu.configs import build_eval_transform

    x = clip(20, t=23, zero_hands=True)
    ref_pipeline = ref.Compose([
        ref.HandCorrection([9, 19, 7], [19, 29, 8]),
        ref.NormalizeKeypoints(0, [3, 4]),
        ref.TemporalSample(16),
        ref.WindowCreate(16),
    ])
    want = ref_pipeline(x.copy())
    got = build_eval_transform(16)(x.copy(), np.random.default_rng(0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_compose_train_pipeline_shapes():
    from sl_hwgat_tpu.configs import build_train_transform

    pipeline = build_train_transform(src_len=32)
    x = clip(14, t=25)
    out = pipeline(x.copy(), np.random.default_rng(0))
    assert out.shape == (32, 64, 2)
    assert np.isfinite(out).all()
