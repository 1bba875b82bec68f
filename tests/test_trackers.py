"""Tracker tests: identity persistence on a synthetic moving-box sequence."""

import numpy as np

from tamtr_tpu.trackers import BOTSORT, BYTETracker


def _frame_dets(t, noise=0.0, rng=None):
    # two objects moving right/down
    b1 = np.array([50 + 4 * t, 50, 90 + 4 * t, 100], np.float32)
    b2 = np.array([200, 80 + 3 * t, 260, 140 + 3 * t], np.float32)
    if rng is not None and noise:
        b1 += rng.normal(0, noise, 4)
        b2 += rng.normal(0, noise, 4)
    boxes = np.stack([b1, b2])
    scores = np.array([0.9, 0.85], np.float32)
    classes = np.array([0, 2], np.float32)
    return boxes, scores, classes


def test_bytetrack_identity_persistence(rng):
    tr = BYTETracker()
    ids_per_frame = []
    for t in range(10):
        boxes, scores, classes = _frame_dets(t, noise=1.0, rng=rng)
        out = tr.update(boxes, scores, classes)
        if t >= 1:
            assert out.shape[1] == 7
            ids_per_frame.append(sorted(out[:, 4].tolist()))
    # identities stay constant across frames
    assert len(ids_per_frame) >= 8
    for ids in ids_per_frame[1:]:
        assert ids == ids_per_frame[0]


def test_bytetrack_low_conf_rescue(rng):
    tr = BYTETracker()
    for t in range(3):
        boxes, scores, classes = _frame_dets(t)
        out = tr.update(boxes, scores, classes)
    # drop confidence of object 1 below high threshold: rescued via stage 2
    boxes, scores, classes = _frame_dets(3)
    scores = np.array([0.3, 0.85], np.float32)
    out = tr.update(boxes, scores, classes)
    assert len(out) == 2


def test_botsort_runs(rng):
    tr = BOTSORT()
    frame = (rng.random((240, 320, 3)) * 255).astype(np.uint8)
    for t in range(5):
        boxes, scores, classes = _frame_dets(t)
        out = tr.update(boxes, scores, classes, frame)
    assert len(out) == 2


def test_make_tracker_and_result_update():
    from tamtr_tpu.engine.results import Results
    from tamtr_tpu.trackers.track import make_tracker, update_result_with_tracks

    t = make_tracker("bytetrack.yaml")
    r1 = Results("f0", np.array([[10.0, 10, 50, 50], [100, 100, 150, 160]]),
                 np.array([0.9, 0.8]), np.array([0, 1]), ["a", "b"])
    update_result_with_tracks(r1, t)
    assert len(r1.track_ids) == 2
    ids0 = set(r1.track_ids.tolist())
    # same boxes next frame -> same identities
    r2 = Results("f1", np.array([[12.0, 11, 52, 51], [101, 102, 151, 161]]),
                 np.array([0.9, 0.8]), np.array([0, 1]), ["a", "b"])
    update_result_with_tracks(r2, t)
    assert set(r2.track_ids.tolist()) == ids0
    import pytest

    with pytest.raises(ValueError):
        make_tracker("nope")
