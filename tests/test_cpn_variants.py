"""Tests: CPN optional heads — uncertainty, bucketed refinement, certainty gating."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu import data, models


def _batch(samples=8, size=64, n=2):
    images, items = [], []
    for i in range(n):
        img, labels = data.random_geometric_objects(size, size, num=4, radius=(5, 10), seed=i)
        images.append(img[..., None].astype(np.float32))
        items.append(data.cpn_targets_single(labels, samples, 5,
                                             rng=np.random.RandomState(i)))
    t = data.collate_cpn_targets(items, max_instances=8)
    return (np.stack(images),
            {k: jnp.asarray(v) for k, v in t.items() if k != 'num_instances'})


@pytest.fixture(scope='module')
def unc_model():
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8),
                      uncertainty_head=True, uncertainty_nms=True)
    m.init(jax.random.PRNGKey(0), (2, 64, 64, 1))
    return m


def test_uncertainty_head_outputs(unc_model):
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    out = unc_model(x, score_thresh=0.3)
    u = out['box_uncertainties'][0]
    assert u.shape[-1] == 4
    assert (u >= 0).all() and (u <= 1).all()  # sigmoid-activated


def test_uncertainty_loss_and_grads(unc_model):
    x, targets = _batch()
    def loss_fn(p):
        out, _ = unc_model.forward_padded({'params': p, **{k: v for k, v in
                                           unc_model.variables.items() if k != 'params'}},
                                          jnp.asarray(x), train=True, targets=targets,
                                          selection_rng=jax.random.PRNGKey(0), mutable=True)
        return out['loss'], out['losses']
    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        unc_model.variables['params'])
    assert 'uncertainty' in losses and np.isfinite(float(losses['uncertainty']))
    # uncertainty head params receive gradients
    g = grads['uncertainty_head']
    assert any(np.abs(np.asarray(l)).max() > 0 for l in jax.tree_util.tree_leaves(g))


def test_certainty_thresh_gating():
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8),
                      uncertainty_head=True, certainty_thresh=0.99)
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    out_gated = m(x, score_thresh=0.3)
    m.certainty_thresh = None
    m._jit_cache.clear()
    out_open = m(x, score_thresh=0.3)
    assert len(out_gated['contours'][0]) <= len(out_open['contours'][0])


def test_refinement_buckets_forward_and_train():
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8), refinement_buckets=6)
    m.init(jax.random.PRNGKey(0), (2, 64, 64, 1))
    x, targets = _batch()
    out = m(x[:1], score_thresh=0.3)
    assert len(out['contours']) == 1
    out2, _ = m.forward_padded(m.variables, jnp.asarray(x), train=True, targets=targets,
                               selection_rng=jax.random.PRNGKey(0), mutable=True)
    assert np.isfinite(float(out2['loss']))


def test_order_reduction_at_inference():
    """Runtime order below trained order (cpn.py:597-598 parity)."""
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8, order=5,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    m.order = 3
    m._jit_cache.clear()
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    out = m(x, score_thresh=0.3)
    if len(out['fourier'][0]):
        assert out['fourier'][0].shape[1] == 3


def test_samples_changeable_on_the_fly():
    m = models.CpnU12(in_channels=1, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    # nms=False: the fg score selection is independent of `samples`, so the
    # detection sets must match exactly. (With NMS the boxes derive from the
    # decoded contours, whose sample density changes keep patterns — counts
    # may legitimately differ on a random-weight net.)
    out8 = m(x, score_thresh=0.3, nms=False)
    m.samples = 32
    m._jit_cache.clear()
    out32 = m(x, score_thresh=0.3, nms=False)
    assert all(c.shape[1] == 32 for c in out32['contours'])
    assert len(out8['contours'][0]) == len(out32['contours'][0])
    np.testing.assert_allclose(np.asarray(out8['scores'][0]),
                               np.asarray(out32['scores'][0]), rtol=1e-5)


def test_multiclass_training_step():
    """CE score path with per-instance class targets trains with finite grads."""
    m = models.CpnU12(in_channels=1, classes=4, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (2, 64, 64, 1))
    x, targets = _batch()
    n_inst = targets['fourier'].shape[1]
    # synthetic classes 1..3 per instance (0 = background)
    classes = (jnp.arange(n_inst)[None, :] % 3 + 1).astype(jnp.int32)
    targets = dict(targets, classes=jnp.tile(classes, (2, 1)))

    def loss_fn(p):
        out, _ = m.forward_padded({'params': p, **{k: v for k, v in m.variables.items()
                                                   if k != 'params'}},
                                  jnp.asarray(x), train=True, targets=targets,
                                  selection_rng=jax.random.PRNGKey(0), mutable=True)
        return out['loss']

    loss, grads = jax.value_and_grad(loss_fn)(m.variables['params'])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
