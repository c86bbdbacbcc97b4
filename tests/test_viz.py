"""Visualization helpers (reference image_process drawing utilities)."""

import numpy as np
import pytest

from ptzjax import viz


def test_draw_keypoints_marks_pixels():
    img = np.zeros((80, 120), np.float32)
    xy = np.array([[30.0, 40.0], [100.0, 10.0], [500.0, 500.0]])  # last OOB
    out = viz.draw_keypoints(img, xy)
    assert out.shape == (80, 120, 3) and out.dtype == np.uint8
    assert (out[40, 30] != 0).any()
    assert (out[10, 100] != 0).any()


def test_draw_matches_side_by_side():
    a = np.random.default_rng(0).uniform(0, 1, (60, 90)).astype(np.float32)
    b = np.random.default_rng(1).uniform(0, 1, (60, 90)).astype(np.float32)
    xy_a = np.array([[10.0, 10.0], [50.0, 30.0]])
    xy_b = np.array([[12.0, 11.0], [52.0, 29.0]])
    out = viz.draw_matches(a, xy_a, b, xy_b, np.array([True, True]))
    assert out.shape == (60, 180, 3)


def test_draw_tracking_and_save(tmp_path):
    pytest.importorskip("matplotlib")
    img = np.zeros((50, 70), np.float32)
    obs = np.array([[20.0, 20.0], [40.0, 30.0]])
    pred = obs + 3.0
    out = viz.draw_tracking(img, obs, pred, used=np.array([True, False]))
    p = viz.save_png(str(tmp_path / "t.png"), out)
    import os

    assert os.path.getsize(p) > 100  # tiny synthetic frame compresses well
    assert (out != viz.draw_tracking(img, obs, pred, used=np.array([True, True]))).any()
