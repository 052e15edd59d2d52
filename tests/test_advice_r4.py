"""Regression tests for the round-4 advisor findings (ADVICE.md r4):

1. warmup_schedule / sequential_schedule must trace inside the jitted train
   step (they are wrapped in optax.scale_by_schedule by CPNTrainer).
2. conf2tweaks_ applied after trainer/TiledInference construction must not be
   silently ignored by already-compiled programs.
3. cpn_targets_single must reject a classes array shorter than max(labels).
4. Adagrad must match torch's zero-initialized accumulator and reject
   lr_decay instead of dropping it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import celldetection_tpu as cdt
from celldetection_tpu import optim as optim_lib


def _tiny_model(seed=0):
    m = cdt.models.CpnU12(in_channels=1, max_detections=32, samples=8, order=3,
                          backbone_kwargs=dict(base_channels=4))
    m.init(jax.random.PRNGKey(seed), (1, 64, 64, 1))
    return m


def _tiny_data(n=2):
    from celldetection_tpu import data
    out = []
    for i in range(n):
        img, labels = data.random_geometric_objects(64, 64, num=4, radius=(4, 10),
                                                    seed=i)
        out.append((img.astype(np.float32)[..., None], labels))
    return out


def test_warmup_schedule_traces_in_jitted_step():
    """The advisor's exact repro: CPNTrainer + warmup_schedule raised
    TracerArrayConversionError on the first step."""
    m = _tiny_model()
    tr = cdt.CPNTrainer(m, optimizer=optax.adam(1e-3),
                        scheduler=optim_lib.warmup_schedule(10),
                        log_fn=lambda *a: None)
    hist = tr.fit(_tiny_data(), epochs=1, batch_size=2)
    assert np.isfinite(hist[0]['loss'])


def test_sequential_schedule_traces_and_matches_eager():
    scheds = [lambda s: 0.5 * jnp.ones_like(jnp.asarray(s, jnp.float32)),
              optim_lib.warmup_schedule(4),
              lambda s: 2.0 * jnp.ones_like(jnp.asarray(s, jnp.float32))]
    fn = optim_lib.sequential_schedule(scheds, milestones=[3, 8])
    jit_fn = jax.jit(fn)

    def eager(step):
        idx = int(np.searchsorted([3, 8], step, side='right'))
        start = [0, 3, 8][idx]
        return float(np.asarray(scheds[idx](step - start)))

    for step in [0, 1, 2, 3, 4, 7, 8, 9, 20]:
        np.testing.assert_allclose(float(jit_fn(step)), eager(step), rtol=1e-6,
                                   err_msg=f'step={step}')
    # trainer integration: sequential schedule inside the jitted step
    m = _tiny_model(1)
    tr = cdt.CPNTrainer(m, optimizer=optax.adam(1e-3),
                        scheduler=optim_lib.sequential_schedule(
                            [optim_lib.warmup_schedule(2),
                             lambda s: jnp.asarray(0.1, jnp.float32)], [2]),
                        log_fn=lambda *a: None)
    hist = tr.fit(_tiny_data(), epochs=1, batch_size=2)
    assert np.isfinite(hist[0]['loss'])


def test_conf2tweaks_invalidate_trainer_and_tiled_programs():
    m = _tiny_model(2)
    tr = cdt.CPNTrainer(m, optimizer=optax.adam(1e-3), log_fn=lambda *a: None)
    data = _tiny_data()
    tr.fit(data, epochs=1, batch_size=2)
    step_fn_before = tr._step_fn
    cdt.conf2tweaks_({'BatchNorm2d': dict(momentum=0.05, eps=1e-3)}, m)
    tr.fit(data, epochs=1, batch_size=2)
    assert tr._step_fn is not step_fn_before, \
        'tweaked model must rebuild the jitted train step'

    from celldetection_tpu.parallel import TiledInference
    m2 = _tiny_model(3)
    tiled = TiledInference(m2, tile_size=64, stride=48)
    tiled(np.random.RandomState(0).rand(96, 96).astype(np.float32),
          score_thresh=0.5)
    fns_before = dict(tiled._fns)
    cdt.conf2tweaks_({'BatchNorm2d': dict(eps=1e-3)}, m2)
    tiled(np.random.RandomState(0).rand(96, 96).astype(np.float32),
          score_thresh=0.5)
    assert all(tiled._fns[k] is not v for k, v in fns_before.items()
               if k in tiled._fns), 'tweaked model must drop stale tile programs'


def test_cpn_targets_single_rejects_short_classes():
    from celldetection_tpu.data import cpn_targets_single
    labels = np.zeros((32, 32), np.int32)
    labels[2:8, 2:8] = 1
    labels[12:18, 12:18] = 2
    labels[22:28, 22:28] = 3
    with pytest.raises(ValueError, match='classes'):
        cpn_targets_single(labels, samples=8, order=3,
                           classes=np.asarray([1, 2]))  # id 3 uncovered
    # exact-length classes still work
    t = cpn_targets_single(labels, samples=8, order=3,
                           classes=np.asarray([1, 2, 3]))
    assert t['classes'].shape == (t['num_instances'],)


def test_adagrad_matches_torch_semantics():
    from celldetection_tpu.util.config import conf2optimizer
    tx = conf2optimizer({'Adagrad': {'lr': 0.1}})
    params = {'w': jnp.asarray(2.0)}
    state = tx.init(params)
    grads = {'w': jnp.asarray(1.0)}
    updates, _ = tx.update(grads, state, params)
    # torch: accumulator starts at 0 -> first update = -lr * g / (sqrt(g^2)+eps)
    np.testing.assert_allclose(float(updates['w']), -0.1, rtol=1e-5)
    with pytest.raises(ValueError, match='lr_decay'):
        conf2optimizer({'Adagrad': {'lr': 0.1, 'lr_decay': 0.5}})
