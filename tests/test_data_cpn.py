"""Tests: host-side data pipeline (EFD, contours, target generator, metrics)."""
import numpy as np
import pytest

from celldetection_tpu import data
from conftest import load_fixture


def test_efd_parity_with_reference():
    fx = load_fixture('efd.npz')
    coeffs, loc = data.efd(fx['contour'], order=6)
    np.testing.assert_allclose(coeffs, fx['coeffs'], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(loc, fx['location'], rtol=1e-10)


def test_fourier2contour_parity():
    fx = load_fixture('efd.npz')
    recon = data.fourier2contour(fx['coeffs'], fx['location'], samples=64)
    np.testing.assert_allclose(recon, fx['recon'], rtol=1e-10)


def test_efd_roundtrip_reconstruction():
    # High-order EFD of a smooth contour must reconstruct it closely.
    theta = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    con = np.stack([50 + 20 * np.cos(theta), 60 + 15 * np.sin(theta)], -1)
    coeffs, loc = data.efd(con, order=12)
    recon = data.fourier2contour(coeffs, loc, samples=400)
    # each original point must be near some reconstructed point
    d = np.linalg.norm(con[:, None] - recon[None], axis=-1).min(1)
    assert d.max() < 0.5


def test_labels2contours_and_back():
    image, labels = data.random_geometric_objects(128, 128, num=6, seed=1)
    contours = data.labels2contours(labels)
    assert len(contours) > 0
    for k, c in contours.items():
        assert c.ndim == 3 and c.shape[-1] == 2
    # rasterize back: each contour's area overlaps its original label
    clist = data.labels2contour_list(labels)
    lbl2 = data.contours2labels(clist, (128, 128))
    m1 = (labels > 0).any(-1)
    m2 = (lbl2 > 0).any(-1)
    inter = (m1 & m2).sum()
    union = (m1 | m2).sum()
    assert inter / union > 0.8


def test_masks2labels():
    masks = np.zeros((2, 32, 32), np.uint8)
    masks[0, 2:8, 2:8] = 1
    masks[1, 20:28, 20:28] = 1
    labels = data.masks2labels(masks)
    assert set(np.unique(labels)) == {0, 1, 2}


def test_target_generator_end_to_end():
    image, labels = data.random_geometric_objects(128, 128, num=8, seed=3)
    gen = data.CPNTargetGenerator(samples=32, order=5, random_sampling=True,
                                  rng=np.random.RandomState(0))
    gen.feed(labels.copy())
    n = gen.fourier.shape[0]
    assert gen.fourier.shape == (n, 5, 4)
    assert gen.locations.shape == (n, 2)
    assert gen.sampled_contours.shape == (n, 32, 2)
    assert gen.resampled_contours.shape == (n, 32, 2)
    assert gen.sampled_sizes.shape == (n, 2)
    red = gen.reduced_labels
    assert red.shape == (128, 128)
    # labels in reduced map: -1 (uncertain ring), 0 (bg), and 1..n
    uni = set(np.unique(red))
    assert uni <= set(range(-1, n + 1))
    # fg cores exist
    assert (red > 0).sum() > 0
    # decoded target contours roughly cover original instances
    for i in range(n):
        c = gen.sampled_contours[i]
        assert np.isfinite(c).all()


def test_resample_contours_equidistant():
    theta = np.linspace(0, 2 * np.pi, 37, endpoint=False)
    con = np.stack([10 * np.cos(theta), 10 * np.sin(theta)], -1) + 50
    rs = data.resample_contours(con, 64)
    assert rs.shape == (64, 2)
    seg = np.linalg.norm(np.diff(np.concatenate([rs, rs[:1]]), axis=0), axis=-1)
    assert seg.std() / seg.mean() < 0.1


def test_label_matcher_perfect_and_offset():
    _, labels = data.random_geometric_objects(96, 96, num=5, seed=5)
    flat = labels.max(-1)
    m = data.LabelMatcher(flat, flat, iou_thresh=0.5)
    assert m.false_positives == 0 and m.false_negatives == 0
    assert m.true_positives == len(np.unique(flat)) - 1
    assert m.f1 > 0.99
    # shifted predictions: lower recall at high iou threshold
    shifted = np.roll(flat, 6, axis=0)
    m2 = data.LabelMatcher(shifted, flat, iou_thresh=0.9)
    assert m2.f1 <= m.f1


def test_label_matcher_list_aggregation():
    _, labels = data.random_geometric_objects(96, 96, num=5, seed=6)
    flat = labels.max(-1)
    lml = data.LabelMatcherList([data.LabelMatcher(flat, flat), data.LabelMatcher(flat, flat)])
    lml.iou_thresh = 0.5
    assert lml.avg_f1 > 0.99
    assert lml.f1_np > 0.99
    assert lml.length == 2
    # custom reduce_fn doubles sums (simulating 2 hosts)
    lml2 = data.LabelMatcherList([data.LabelMatcher(flat, flat)], reduce_fn=lambda v: v * 2)
    assert lml2.length == 2


def test_filter_instances_():
    labels = np.zeros((32, 32, 1), np.int32)
    labels[0, 0:5, 0] = 1       # touches border
    labels[10:12, 10:12, 0] = 2  # area 4
    labels[20:30, 20:30, 0] = 3  # area 100
    data.filter_instances_(labels, partials=True, partials_border=1, min_area=5, constant=-1,
                           continuous=True)
    uni = set(np.unique(labels))
    assert -1 in uni and 1 in uni  # relabeled big instance -> 1
    assert 3 not in uni and 2 not in uni


def test_segmentation_helpers():
    masks = [np.pad(np.ones((4, 4), np.uint8), 2), np.pad(np.ones((2, 2), np.uint8), 3)]
    lbl = data.unary_masks2labels(masks)
    assert lbl.shape == (8, 8, 2)
    boxes = [(0, 0, 3, 3), (5, 5, 7, 7)]
    bm = data.boxes2masks(boxes, (8, 8))
    assert len(bm) == 2 and bm[1].max() == 2


def test_normalize_percentile():
    rng = np.random.RandomState(0)
    img = rng.rand(64, 64) * 1000
    out = data.normalize_percentile(img, 99.9)
    assert out.min() >= 0 and out.max() <= 1


def test_universal_dict_collate_fn():
    batch = [
        {'image': np.zeros((4, 5, 3)), 'idx': 0},
        None,
        {'image': np.zeros((6, 3, 3)), 'idx': 1},
    ]
    out = data.universal_dict_collate_fn(batch)
    assert out['image'].shape == (2, 6, 5, 3)
    assert out['idx'] == [0, 1]


def test_rle2mask():
    mask = data.rle2mask([1, 3, 10, 2], (4, 4))
    assert mask.sum() == 5


def test_contours2overlay_multiprocess_matches_sequential_coverage():
    """The shared-memory parallel renderer covers exactly the same pixels as
    the sequential path (colors are per-contour random, so compare alpha)."""
    import numpy as np
    from celldetection_tpu.data.cpn import contours2overlay

    rng = np.random.RandomState(0)
    contours = []
    for _ in range(300):
        c = rng.rand(2) * 220 + 18
        r = rng.rand() * 10 + 3
        t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        contours.append(np.stack([c[0] + r * np.cos(t), c[1] + r * np.sin(t)], -1))

    seq = contours2overlay(contours, (256, 256), seed=0)
    par = contours2overlay(contours, (256, 256), seed=0, processes=3)
    np.testing.assert_array_equal(seq[..., 3] > 0, par[..., 3] > 0)
    assert (par[..., 3] > 0).sum() > 1000
