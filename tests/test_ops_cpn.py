"""Parity tests: decode-chain ops vs reference fixtures (fp32 tolerance)."""
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu import ops
from conftest import load_fixture


def test_fouriers2contours_default_sampling():
    fx = load_fixture('fouriers2contours.npz')
    con, samp = ops.fouriers2contours(jnp.asarray(fx['fourier']), jnp.asarray(fx['locations']), samples=32)
    np.testing.assert_allclose(np.asarray(con), fx['contours'], rtol=1e-5, atol=1e-4)
    assert samp.shape == (32,)


def test_fouriers2contours_custom_sampling():
    fx = load_fixture('fouriers2contours.npz')
    con, _ = ops.fouriers2contours(jnp.asarray(fx['fourier']), jnp.asarray(fx['locations']),
                                   sampling=jnp.asarray(fx['sampling']))
    np.testing.assert_allclose(np.asarray(con), fx['contours_sampled'], rtol=1e-5, atol=1e-4)


def test_rel_location2abs_location_channel_first():
    fx = load_fixture('rel_location2abs_location.npz')
    out = ops.rel_location2abs_location(jnp.asarray(fx['locations']))
    np.testing.assert_allclose(np.asarray(out), fx['out'], rtol=1e-6, atol=1e-6)


def test_rel_location2abs_location_channel_last():
    fx = load_fixture('rel_location2abs_location.npz')
    loc = np.moveaxis(fx['locations'], 1, -1)
    out = ops.rel_location2abs_location(jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(out), np.moveaxis(fx['out'], 1, -1), rtol=1e-6, atol=1e-6)


def test_scale_contours_and_fourier():
    fx = load_fixture('scaling.npz')
    sc = ops.scale_contours((64, 48), (256, 192), jnp.asarray(fx['contours']))
    np.testing.assert_allclose(np.asarray(sc), fx['scaled_contours'], rtol=1e-6)
    sf, sl = ops.scale_fourier((64, 48), (256, 192), jnp.asarray(fx['fourier']), jnp.asarray(fx['locations']))
    np.testing.assert_allclose(np.asarray(sf), fx['scaled_fourier'], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sl), fx['scaled_locations'], rtol=1e-6)


def test_order_weighting_and_buckets():
    fx = load_fixture('weighting.npz')
    np.testing.assert_allclose(np.asarray(ops.order_weighting(5)), fx['order_weighting'], rtol=1e-6)
    buckets = ops.resolve_refinement_buckets(jnp.asarray(fx['samplings']), 6)
    for i, (bi, bw) in enumerate(buckets):
        np.testing.assert_array_equal(np.asarray(bi), fx[f'b{i}i'])
        np.testing.assert_allclose(np.asarray(bw), fx[f'b{i}w'], rtol=1e-5, atol=1e-6)


def test_remove_border_contours():
    fx = load_fixture('filters.npz')
    keep = ops.remove_border_contours(jnp.asarray(fx['contours']), (128, 128), padding=4,
                                      top=True, right=False, bottom=True, left=True)
    np.testing.assert_array_equal(np.asarray(keep), fx['keep_border'])


def test_filter_contours_by_stitching_rule():
    fx = load_fixture('filters.npz')
    keep = ops.filter_contours_by_stitching_rule(jnp.asarray(fx['contours']), (128, 128),
                                                 jnp.asarray(fx['overlaps']), rule='ex_br')
    np.testing.assert_array_equal(np.asarray(keep), fx['keep_stitch'])


def test_downsample_labels():
    fx = load_fixture('downsample_labels.npz')
    x = jnp.asarray(np.moveaxis(fx['labels'], 1, -1))  # NCHW fixture -> NHWC
    out16 = ops.downsample_labels(x, [16, 16])
    np.testing.assert_allclose(np.asarray(out16), np.moveaxis(fx['out16'], 1, -1), rtol=1e-6)
    out24 = ops.downsample_labels(x, [24, 24])
    np.testing.assert_allclose(np.asarray(out24), np.moveaxis(fx['out24'], 1, -1), rtol=1e-6)


def test_resize_bilinear_matches_torch():
    fx = load_fixture('resize.npz')
    x = jnp.asarray(np.moveaxis(fx['x'], 1, -1))
    y = ops.resize_bilinear(x, (37, 41))
    np.testing.assert_allclose(np.asarray(y), np.moveaxis(fx['y'], 1, -1), rtol=1e-4, atol=1e-5)


def test_contours2boxes():
    rng = np.random.RandomState(1)
    cons = rng.rand(10, 8, 2).astype(np.float32)
    boxes = ops.contours2boxes(jnp.asarray(cons))
    np.testing.assert_allclose(np.asarray(boxes),
                               np.concatenate([cons.min(1), cons.max(1)], 1), rtol=1e-6)


def _oracle_nms(boxes, scores, thresh):
    """Brute-force exact greedy NMS oracle (torchvision semantics)."""
    order = np.argsort(-scores, kind='stable')
    suppressed = np.zeros(len(boxes), bool)
    keep = np.zeros(len(boxes), bool)
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order[oi + 1:]:
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            union = a1 + a2 - inter
            if union > 0 and inter / union > thresh:
                suppressed[j] = True
    return keep


@pytest.mark.parametrize('n,thresh', [(50, 0.2), (300, 0.5), (513, 0.2)])
def test_nms_padded_exact_greedy(n, thresh):
    rng = np.random.RandomState(n)
    centers = rng.rand(n, 2).astype(np.float32) * 100
    sizes = rng.rand(n, 2).astype(np.float32) * 20 + 2
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.1
    oracle = _oracle_nms(boxes[valid], scores[valid], thresh)
    keep = ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thresh)
    keep = np.asarray(keep)
    assert not keep[~valid].any()
    np.testing.assert_array_equal(keep[valid], oracle)


def test_nms_batched():
    rng = np.random.RandomState(7)
    boxes = rng.rand(2, 64, 4).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2] + .1
    scores = rng.rand(2, 64).astype(np.float32)
    valid = np.ones((2, 64), bool)
    keep = ops.batched_box_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(keep[b]), _oracle_nms(boxes[b], scores[b], 0.3))


def test_pairwise_iou_giou():
    rng = np.random.RandomState(3)
    b1 = rng.rand(20, 4).astype(np.float32)
    b1[:, 2:] += b1[:, :2] + .1
    b2 = rng.rand(20, 4).astype(np.float32)
    b2[:, 2:] += b2[:, :2] + .1
    iou = np.asarray(ops.pairwise_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    giou = np.asarray(ops.pairwise_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert (iou >= 0).all() and (iou <= 1).all()
    assert (giou <= iou + 1e-6).all()
    # identical boxes: iou = giou = 1
    same = np.asarray(ops.pairwise_box_iou(jnp.asarray(b1), jnp.asarray(b1)))
    np.testing.assert_allclose(same, 1., rtol=1e-5)


def test_box_voting():
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 10, 10.5], [50, 50, 60, 60]], np.float32))
    mask, votes = ops.filter_by_box_voting(boxes, thresh=.5, min_vote=1.5, return_votes=True)
    np.testing.assert_array_equal(np.asarray(mask), [True, True, False])


def test_process_scores_binary_and_multi():
    rng = np.random.RandomState(0)
    logits1 = jnp.asarray(rng.randn(1, 8, 8, 1).astype(np.float32))
    s, c = ops.process_scores(logits1, 1, 0.5)
    np.testing.assert_allclose(np.asarray(s), 1 / (1 + np.exp(-np.asarray(logits1))), rtol=1e-5)
    logits2 = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    s2, c2 = ops.process_scores(logits2, 2, 0.5)
    assert s2.shape == (1, 8, 8, 1)
    logits5 = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    s5, c5 = ops.process_scores(logits5, 5, 0.5)
    assert s5.shape == (1, 8, 8, 5) and int(c5.max()) <= 4
