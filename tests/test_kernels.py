"""Tests: Pallas kernels (interpret mode on CPU; compiled on TPU hardware)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu.ops.boxes import nms_padded


def _random_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.rand(n, 2).astype(np.float32) * 200
    sizes = rng.rand(n, 2).astype(np.float32) * 30 + 2
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.05
    return boxes, scores, valid


@pytest.mark.parametrize('n', [300, 1024])
def test_nms_pallas_interpret_matches_xla(n):
    """Pallas kernel (interpret mode) produces the exact XLA keep set."""
    from celldetection_tpu.kernels.nms_pallas import nms_pallas

    boxes, scores, valid = _random_boxes(n)
    expected = np.asarray(nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.3))
    got = np.asarray(nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(valid), iou_threshold=0.3, interpret=True))
    np.testing.assert_array_equal(got, expected)
