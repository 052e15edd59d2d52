"""Metric-engine parity: our LabelMatcher vs the reference's.

The BBBC039 accuracy harness (scripts/eval_bbbc039.py) reports F1/Jaccard via
LabelMatcher; this test pins that engine to the reference implementation
(``celldetection/data/instance_eval.py:99-554``) on identical inputs, so
accuracy numbers produced by the harness are directly comparable to numbers
produced by the reference stack.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')
cv2 = pytest.importorskip('cv2')

REFERENCE = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REFERENCE, 'celldetection')),
                                reason='reference checkout not available')


@pytest.fixture(scope='session')
def ref_cd():
    import refshim
    refshim.install()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import celldetection as cd
    return cd


def _random_labels(rng, size=128, n=14, radius=(5, 14)):
    lab = np.zeros((size, size), np.int32)
    for i in range(1, n + 1):
        c = tuple(int(v) for v in rng.randint(5, size - 5, 2))
        r = int(rng.randint(*radius))
        cv2.circle(lab, c, r, int(i), -1)
    return lab


def _perturb(rng, labels, drop=2, shift=2):
    """Simulated predictions: drop some instances, shift others, add one FP."""
    out = np.zeros_like(labels)
    ids = [i for i in np.unique(labels) if i]
    kept = [i for i in ids if rng.rand() > drop / max(len(ids), 1)]
    for i in kept:
        dy, dx = rng.randint(-shift, shift + 1, 2)
        m = np.roll(np.roll(labels == i, dy, 0), dx, 1)
        out[m] = i
    c = tuple(int(v) for v in rng.randint(10, labels.shape[0] - 10, 2))
    cv2.circle(out, c, 4, int(max(ids) + 1), -1)
    return out


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_label_matcher_matches_reference(ref_cd, seed):
    from celldetection_tpu.data.instance_eval import LabelMatcher

    rng = np.random.RandomState(seed)
    target = _random_labels(rng)
    pred = _perturb(rng, target)

    ours = LabelMatcher(pred, target)
    theirs = ref_cd.data.LabelMatcher(pred, target)
    for iou_thresh in (0.5, 0.6, 0.75, 0.9):
        ours.iou_thresh = iou_thresh
        theirs.iou_thresh = iou_thresh
        for name in ('true_positives', 'false_positives', 'false_negatives'):
            assert getattr(ours, name) == getattr(theirs, name), (iou_thresh, name)
        for name in ('precision', 'recall', 'f1', 'jaccard', 'fowlkes_mallows'):
            a, b = getattr(ours, name), getattr(theirs, name)
            assert abs(a - b) < 1e-9, (iou_thresh, name, a, b)


def test_label_matcher_list_reduction_matches_reference(ref_cd):
    from celldetection_tpu.data.instance_eval import LabelMatcher, LabelMatcherList

    rng = np.random.RandomState(3)
    ours_list = LabelMatcherList()
    theirs_list = ref_cd.data.LabelMatcherList()
    for _ in range(4):
        target = _random_labels(rng)
        pred = _perturb(rng, target)
        ours_list.append(LabelMatcher(pred, target))
        theirs_list.append(ref_cd.data.LabelMatcher(pred, target))
    for iou_thresh in (0.5, 0.75):
        ours_list.iou_thresh = iou_thresh
        theirs_list.iou_thresh = iou_thresh
        for name in ('f1_np', 'avg_f1', 'jaccard_np', 'avg_recall', 'avg_precision'):
            a, b = getattr(ours_list, name), getattr(theirs_list, name)
            assert abs(a - b) < 1e-9, (iou_thresh, name, a, b)


def test_multichannel_overlap_support_matches_reference(ref_cd):
    """Channelled label images (overlaps resolved across channels) — the
    representation contours2labels produces for crowded predictions."""
    from celldetection_tpu.data.instance_eval import LabelMatcher

    rng = np.random.RandomState(4)
    a = np.stack([_random_labels(rng, n=6), _random_labels(rng, n=5) * 0], -1)
    a[..., 1][a[..., 0] == 0] = _random_labels(rng, n=4)[a[..., 0] == 0] + 100
    b = _random_labels(rng, n=8)
    ours = LabelMatcher(a, b, iou_thresh=0.5)
    theirs = ref_cd.data.LabelMatcher(a, b, iou_thresh=0.5)
    assert ours.true_positives == theirs.true_positives
    assert abs(ours.f1 - theirs.f1) < 1e-9
