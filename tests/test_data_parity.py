"""Host-data-layer parity: rewritten numpy ops vs the executed reference.

These functions were re-implemented with different algorithms (batched
searchsorted resampling; find_objects-driven distance transforms); this test
pins them numerically to the reference (``celldetection/data/misc.py:371-405``,
``celldetection/data/cpn.py:424-497``) on identical random inputs.
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


def _random_closed_contour(rng, n=None):
    n = n or int(rng.randint(8, 40))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(4, 20, n)
    c = rng.uniform(20, 80, 2)
    return np.stack([c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)], -1)


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('num', [16, 64, None, .5])
def test_resample_contours_parity(ref_cd, seed, num):
    from celldetection_tpu.data.misc import resample_contours
    rng = np.random.RandomState(seed)
    single = _random_closed_contour(rng)
    got = resample_contours(single, num)
    want = ref_cd.data.misc.resample_contours(single, num)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)

    batch = np.stack([_random_closed_contour(rng, 24) for _ in range(5)])
    got = resample_contours(batch, 32)
    want = ref_cd.data.misc.resample_contours(batch, 32)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)

    as_list = [_random_closed_contour(rng) for _ in range(3)]
    got = resample_contours(as_list, 16)
    want = ref_cd.data.misc.resample_contours(as_list, 16)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-8)


def _overlapping_labels(rng, size=96, n=10, channels=2):
    lab = np.zeros((size, size, channels), np.int32)
    for i in range(1, n + 1):
        ch = int(rng.randint(channels))
        c = tuple(int(v) for v in rng.randint(8, size - 8, 2))
        r = int(rng.randint(2, 14))  # includes tiny (protected-size) instances
        plane = np.ascontiguousarray(lab[..., ch])
        cv2.circle(plane, c, r, int(i), -1)
        lab[..., ch] = plane
    return lab


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
@pytest.mark.parametrize('per_instance', [True, False])
def test_labels2distances_parity(ref_cd, seed, per_instance):
    from celldetection_tpu.data.cpn import labels2distances, mask_labels_by_distance_
    rng = np.random.RandomState(seed)
    labels = _overlapping_labels(rng)

    got_d, got_l = labels2distances(labels, per_instance=per_instance)
    want_d, want_l = ref_cd.data.cpn.labels2distances(labels, per_instance=per_instance)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(got_l, want_l)

    mask_labels_by_distance_(got_l, got_d, .5, .75)
    ref_cd.data.cpn.mask_labels_by_distance_(want_l, want_d, .5, .75)
    np.testing.assert_array_equal(got_l, want_l)
