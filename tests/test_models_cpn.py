"""Tests: CPN model forward, decode, loss, and a short end-to-end training run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from celldetection_tpu import data, models


@pytest.fixture(scope='module')
def small_model():
    m = models.CpnU22(in_channels=1, max_detections=128, samples=16,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 64, 64, 1))
    return m


def test_forward_shapes_and_keys(small_model):
    x = np.random.RandomState(0).rand(2, 64, 64, 1).astype(np.float32)
    out = small_model(x)
    for k in ('contours', 'boxes', 'scores', 'classes', 'locations', 'fourier',
              'contour_proposals'):
        assert k in out and len(out[k]) == 2
    for c in out['contours']:
        assert c.ndim == 3 and c.shape[1:] == (16, 2)


def test_forward_padded_is_jittable(small_model):
    x = jnp.zeros((1, 64, 64, 1))
    fn = jax.jit(lambda v, x: small_model.forward_padded(v, x, nms=True))
    out = fn(small_model.variables, x)
    assert out['contours'].shape == (1, 128, 16, 2)
    assert out['valid'].shape == (1, 128)
    assert out['boxes'].shape == (1, 128, 4)


def test_input_layout_flexibility(small_model):
    rng = np.random.RandomState(1)
    img_hw = rng.rand(64, 64).astype(np.float32)
    out1 = small_model(img_hw)                       # HW
    out2 = small_model(img_hw[None, None])           # NCHW
    out3 = small_model((img_hw[None, ..., None] * 255).astype(np.uint8))  # NHWC uint8
    assert len(out1['contours']) == len(out2['contours']) == len(out3['contours']) == 1


def test_score_thresh_affects_detections(small_model):
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    out_low = small_model(x, score_thresh=0.01)
    out_high = small_model(x, score_thresh=0.999)
    assert len(out_low['contours'][0]) >= len(out_high['contours'][0])


def _make_batch(batch_size=2, size=64, samples=16, order=5, seed=0):
    images, target_items = [], []
    for i in range(batch_size):
        img, labels = data.random_geometric_objects(size, size, num=5, radius=(5, 12),
                                                    seed=seed + i)
        images.append(img[..., None].astype(np.float32))
        target_items.append(data.cpn_targets_single(labels, samples, order,
                                                    rng=np.random.RandomState(i)))
    x = np.stack(images)
    targets = data.collate_cpn_targets(target_items, max_instances=16)
    return x, targets


def test_training_loss_and_grads(small_model):
    x, targets = _make_batch(samples=16)
    targets_j = {k: jnp.asarray(v) for k, v in targets.items() if k != 'num_instances'}

    def loss_fn(params):
        variables = {**small_model.variables, 'params': params}
        out, _ = small_model.forward_padded(
            variables, jnp.asarray(x), train=True, targets=targets_j,
            selection_rng=jax.random.PRNGKey(0), mutable=True)
        return out['loss'], out['losses']

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        small_model.variables['params'])
    assert np.isfinite(float(loss))
    for k in ('score', 'fourier', 'location', 'contour', 'refinement', 'iou'):
        assert k in losses, f'missing loss {k}'
        assert np.isfinite(float(losses[k])), f'non-finite loss {k}'
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_short_training_run_decreases_loss():
    import optax
    model = models.CpnU12(in_channels=1, max_detections=64, samples=12,
                          backbone_kwargs=dict(base_channels=8), classes=2)
    model.init(jax.random.PRNGKey(1), (2, 64, 64, 1))
    x, targets = _make_batch(samples=12, seed=7)
    targets_j = {k: jnp.asarray(v) for k, v in targets.items() if k != 'num_instances'}
    xj = jnp.asarray(x)

    tx = optax.adam(1e-3)
    params = model.variables['params']
    state = {k: v for k, v in model.variables.items() if k != 'params'}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, rng):
        def loss_fn(p):
            out, new_state = model.forward_padded({'params': p, **state}, xj, train=True,
                                                  targets=targets_j, selection_rng=rng,
                                                  mutable=True)
            return out['loss'], new_state
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(14):
        rng, sub = jax.random.split(rng)
        params, state, opt_state, loss = step(params, state, opt_state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), f'no improvement: {losses}'


def test_nms_dedup_in_forward(small_model):
    x = np.random.RandomState(0).rand(1, 64, 64, 1).astype(np.float32)
    out_nms = small_model(x, score_thresh=0.01, nms=True)
    out_raw = small_model(x, score_thresh=0.01, nms=False)
    assert len(out_nms['contours'][0]) <= len(out_raw['contours'][0])


def test_multiclass_head():
    m = models.CpnU12(in_channels=1, classes=4, max_detections=32, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(0), (1, 32, 32, 1))
    x = np.random.RandomState(0).rand(1, 32, 32, 1).astype(np.float32)
    out = m(x, score_thresh=0.2)
    assert all(c.max(initial=0) <= 3 for c in out['classes'])


def test_get_cpn_registry():
    assert models.get_cpn('CpnU22') is models.CpnU22
    with pytest.raises(KeyError):
        models.get_cpn('CpnDoesNotExist')
