"""Regression tests for the round-2 advisor findings (ADVICE.md)."""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest


def test_batched_box_nmsi_reference_default_chunk():
    """batch_size=50000 (the reference's NMS_BATCH_SIZE) must not assert even
    when N exceeds the chunk — chunk is rounded up to a tile multiple."""
    from celldetection_tpu.ops.boxes import batched_box_nmsi

    rng = np.random.RandomState(0)
    n = 60_000
    xy = rng.uniform(0, 4000, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 24, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = rng.rand(n).astype(np.float32)
    (keep,) = batched_box_nmsi([boxes], [scores], 0.5, batch_size=50_000)
    assert len(keep) > 0
    # kept indices come back sorted by descending score
    assert np.all(np.diff(scores[keep]) <= 0)


def test_nms_chunk_not_tile_multiple_matches_exact_for_small_n():
    """For N <= chunk the chunked path equals exact greedy regardless of the
    chunk/tile relationship."""
    from celldetection_tpu.ops.boxes import nms_chunked, nms_padded

    rng = np.random.RandomState(1)
    n = 500
    xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(4, 24, (n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    valid = jnp.ones(n, bool)
    got = nms_chunked(boxes, scores, valid, 0.5, chunk=333, tile=128)
    want = nms_padded(boxes, scores, valid, 0.5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_suppression_formulation_unified():
    """The XLA sweep and the Pallas kernel both use inter > thresh*union; the
    shared helper must agree with box_iou on non-tie inputs."""
    from celldetection_tpu.ops.boxes import _suppression_matrix, box_iou

    rng = np.random.RandomState(2)
    xy = rng.uniform(0, 100, (64, 2)).astype(np.float32)
    wh = rng.uniform(4, 30, (64, 2)).astype(np.float32)
    b = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    sup = np.asarray(_suppression_matrix(b, b, 0.5))
    iou = np.asarray(box_iou(b, b))
    # avoid asserting on knife-edge values (none expected on random floats)
    np.testing.assert_array_equal(sup, iou > 0.5)


def test_prepare_inputs_warns_on_0_255_float():
    from celldetection_tpu.models import CpnU22

    model = CpnU22(in_channels=3, order=2, samples=16)
    bad = np.random.RandomState(3).uniform(0, 255, (32, 32, 3)).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        model.prepare_inputs(bad)
    assert any('clamped by Normalize' in str(x.message) for x in w)
    ok = bad / 255.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        model.prepare_inputs(ok)
        model.prepare_inputs((bad.astype(np.uint8)))
    assert not any('clamped by Normalize' in str(x.message) for x in w)
