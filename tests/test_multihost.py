"""Real 2-process multi-host paths (jax.distributed over local TCP).

Spawns two coordinated JAX processes on the CPU platform and exercises:
  - ``multihost_tiled_inference``: one mosaic's tiles split across processes,
    fixed-shape ``process_allgather`` exchange, replicated final NMS.
  - ``CPNTrainer.gather_item_records``: cross-process item-record merge.

This covers what the reference only validates in production Slurm runs
(``cpn_inference.py:257-308``; ``lightning_base.py:322-336``).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r'''
import os, sys, json
port, pid = sys.argv[1], int(sys.argv[2])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4')
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(f'localhost:{port}', num_processes=2, process_id=pid)
import numpy as np
sys.path.insert(0, os.environ['CDT_REPO'])
from celldetection_tpu import data, models
from celldetection_tpu.parallel.tiles import TiledInference, multihost_tiled_inference

assert jax.process_count() == 2
model = models.CpnU12(in_channels=1, max_detections=64, samples=8,
                      backbone_kwargs=dict(base_channels=8))
model.init(jax.random.PRNGKey(0), (1, 64, 64, 1))  # same seed => same params

img, _ = data.random_geometric_objects(200, 200, num=20, radius=(6, 12), seed=3)
tiled = TiledInference(model, tile_size=64, stride=48, max_outputs=512)
res = multihost_tiled_inference(tiled, img.astype(np.float32), score_thresh=0.45)

# cross-process item-record gather
from celldetection_tpu.runtime.trainer import CPNTrainer
tr = CPNTrainer(model)
tr.item_record = {pid * 10: [{'batch_loss': 1.0 + pid}],
                  99: [{'batch_loss': float(pid)}]}
rec = tr.gather_item_records()

print('RESULT' + json.dumps({
    'pid': pid,
    'num_tiles': int(res['num_tiles']),
    'num_valid': int(res['num_valid']),
    'boxes_sum': float(np.asarray(res['boxes']).sum()),
    'record_keys': sorted(rec.keys()),
    'record_99': sorted(r['batch_loss'] for r in rec[99]),
}))
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_multihost_inference_and_records(tmp_path):
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
    # the final result is replicated: both processes computed the same answer
    assert a['num_tiles'] == b['num_tiles'] == 16
    assert a['num_valid'] == b['num_valid']
    assert abs(a['boxes_sum'] - b['boxes_sum']) < 1e-3
    # item records merged across processes on both sides
    assert a['record_keys'] == b['record_keys'] == [0, 10, 99]
    assert a['record_99'] == b['record_99'] == [0.0, 1.0]
