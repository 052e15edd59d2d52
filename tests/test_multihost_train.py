"""Real 2-process multi-host TRAINING (jax.distributed over local TCP).

Spawns two coordinated JAX processes (CPU platform, 4 virtual devices each →
one 8-device global mesh) and trains with ``make_train_step``: each process
feeds only its process-local half of the global batch, the step assembles
global arrays via ``jax.make_array_from_process_local_data``, and XLA inserts
the gradient all-reduce across processes (the DCN path on a pod).

Asserts (VERDICT r4 item 1):
  - params are bit-identical across the two processes after N steps,
  - the loss sequence matches a single-process run on the union batch,
  - ``CPNTrainer.fit`` works in the same regime (per-process data slices).

Reference equivalent: multi-node DDP training, which the reference only
validates in production (``celldetection_scripts/cpn_inference.py:504-511``;
``celldetection/models/lightning_base.py:397-440``).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

_COMMON = r'''
import numpy as np


def build_item(i, size=64, samples=8):
    from celldetection_tpu import data
    img, labels = data.random_geometric_objects(size, size, num=4, radius=(4, 10),
                                                seed=100 + i)
    item = data.cpn_targets_single(labels, samples, 5, rng=np.random.RandomState(i))
    return img[..., None].astype(np.float32), item


def build_batch(indices):
    from celldetection_tpu import data
    pairs = [build_item(i) for i in indices]
    targets = data.collate_cpn_targets([it for _, it in pairs], max_instances=8)
    return {'image': np.stack([im for im, _ in pairs]),
            **{k: v for k, v in targets.items() if k != 'num_instances'}}


def make_model(seed=0):
    import jax
    from celldetection_tpu import models
    m = models.CpnU12(in_channels=1, max_detections=64, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(jax.random.PRNGKey(seed), (1, 64, 64, 1))
    return m
'''

_WORKER = _COMMON + r'''
import os, sys, json
port, pid = sys.argv[1], int(sys.argv[2])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(f'localhost:{port}', num_processes=2, process_id=pid)
sys.path.insert(0, os.environ['CDT_REPO'])
import optax
from celldetection_tpu import parallel

assert jax.process_count() == 2 and len(jax.devices()) == 8
mesh = parallel.make_mesh((8,), ('data',))
assert parallel.train.mesh_spans_processes(mesh)

# --- make_train_step: per-process half of a global batch of 8 --------------
model = make_model(0)  # same seed on both processes => identical params
local_batch = build_batch(range(pid * 4, (pid + 1) * 4))
tx = optax.adam(1e-3)
state = parallel.TrainState.create(model, tx)
step = parallel.make_train_step(model, tx, mesh=mesh)
losses = []
for s in range(3):
    state, metrics = step(state, local_batch, jax.random.PRNGKey(1 + s))
    losses.append(float(metrics['loss']))

def checksum(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))

params_sum = checksum(state.params)

# --- CPNTrainer.fit: per-process data slices over the same mesh ------------
from celldetection_tpu.runtime.trainer import CPNTrainer
from celldetection_tpu import data
fit_model = make_model(1)
ds = []
for i in range(8):
    img, labels = data.random_geometric_objects(64, 64, num=4, radius=(4, 10),
                                                seed=200 + i)
    ds.append((img.astype(np.float32)[..., None], labels))
tr = CPNTrainer(fit_model, optimizer=optax.adam(1e-3), mesh=mesh, seed=7,
                log_fn=lambda *a: None)
# batch must cover the 8-device data axis (1 item/device); each process
# builds its local half of 4
hist = tr.fit(ds, epochs=2, batch_size=8)
fit_sum = checksum(tr.state.params)

print('RESULT' + json.dumps({
    'pid': pid, 'losses': losses, 'params_sum': params_sum,
    'fit_losses': [h['loss'] for h in hist], 'fit_sum': fit_sum,
}))
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """Run the same 3 steps single-process on the union batch (8 items)."""
    import jax
    import optax
    from celldetection_tpu import parallel

    scope = {}
    exec(compile(_COMMON, '<common>', 'exec'), scope)
    model = scope['make_model'](0)
    batch = scope['build_batch'](range(8))
    tx = optax.adam(1e-3)
    state = parallel.TrainState.create(model, tx)
    step = parallel.make_train_step(model, tx, mesh=None)
    losses = []
    for s in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(1 + s))
        losses.append(float(metrics['loss']))
    return losses


def test_two_process_training(tmp_path):
    port = _free_port()
    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env['CDT_REPO'] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, str(worker), str(port), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')][-1]
        outs.append(json.loads(line[len('RESULT'):]))

    a, b = sorted(outs, key=lambda o: o['pid'])
    # replicated training state: both processes hold bit-identical params
    assert a['params_sum'] == b['params_sum']
    assert a['losses'] == b['losses']
    assert a['fit_sum'] == b['fit_sum'] and np.isfinite(a['fit_sum'])
    assert a['fit_losses'] == b['fit_losses']
    assert all(np.isfinite(a['losses'])) and all(np.isfinite(a['fit_losses']))

    # the 2-process loss sequence matches the single-process union-batch run
    # (reduction reordering across the sharded sum gives ~1e-4 relative noise)
    ref = _single_process_reference()
    np.testing.assert_allclose(a['losses'], ref, rtol=1e-3)
