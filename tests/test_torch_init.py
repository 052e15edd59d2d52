"""Regression gate for reference-matching parameter init (round-4 fix).

The round-3 trained-accuracy gap traced to init *statistics*, not to
loss/gradients/targets (HEADTOHEAD.json: with matched init the two training
pipelines agree to f1 delta -0.003). These tests pin the fixed component:
CPN.init() must re-draw parameters to the torch reference's distributions
(reference scheme sources: celldetection/models/unet.py:171-176 decoder
kaiming_uniform(a=1)+zero bias; resnet.py/commons.py torch conv defaults).
"""
import jax
import jax.numpy as jnp
import numpy as np

from celldetection_tpu import models
from celldetection_tpu.util.init import _fan_in


def _collect(tree, path=()):
    """Yield (path, kernel, bias) for every conv/dense param pair."""
    if isinstance(tree, dict):
        if 'kernel' in tree and getattr(tree['kernel'], 'ndim', 0) >= 2:
            yield path, np.asarray(tree['kernel']), \
                (None if tree.get('bias') is None else np.asarray(tree['bias']))
        for k, v in tree.items():
            if k not in ('kernel', 'bias'):
                yield from _collect(v, path + (k,))


def _build(seed=0, **kw):
    m = models.CpnU12(in_channels=1, order=3, samples=16, max_detections=64,
                      backbone_kwargs=dict(base_channels=16), **kw)
    m.init(jax.random.PRNGKey(seed), (1, 32, 32, 1))
    return m


def test_decoder_kaiming_uniform_zero_bias():
    m = _build()
    pairs = list(_collect(m.variables['params']))
    dec = [(p, k, b) for p, k, b in pairs
           if any('unet' in s.lower() or 'fpn' in s.lower() for s in p)]
    assert dec, 'no decoder subtree found — path layout changed?'
    for path, kernel, bias in dec:
        bound = np.sqrt(3.0 / _fan_in(kernel.shape))
        assert np.abs(kernel).max() <= bound + 1e-6, (path, np.abs(kernel).max(), bound)
        if kernel.size >= 256:  # enough samples for a meaningful std check
            # uniform(-b, b) std = b/sqrt(3); tolerate 15% sampling noise
            assert abs(kernel.std() - bound / np.sqrt(3)) < 0.15 * bound, path
        if bias is not None:
            assert np.all(bias == 0), (path, 'decoder biases must be zero')


def test_encoder_and_heads_torch_conv_default():
    m = _build()
    pairs = list(_collect(m.variables['params']))
    enc = [(p, k, b) for p, k, b in pairs
           if not any('unet' in s.lower() or 'fpn' in s.lower() for s in p)]
    assert enc
    nonzero_bias = 0
    for path, kernel, bias in enc:
        bound = 1.0 / np.sqrt(_fan_in(kernel.shape))
        assert np.abs(kernel).max() <= bound + 1e-6, (path, np.abs(kernel).max(), bound)
        if bias is not None and np.any(bias != 0):
            nonzero_bias += 1
            assert np.abs(bias).max() <= bound + 1e-6, path
    # torch's default draws biases from U(+-1/sqrt(fan_in)) — they must NOT
    # be flax's all-zero default
    assert nonzero_bias > 0, 'encoder/head biases all zero: torch init not applied'


def test_torch_init_opt_out_and_determinism():
    # opt-out keeps flax defaults: lecun_normal is unbounded, so some kernel
    # exceeds the torch uniform bound with overwhelming probability
    m_flax = _build(torch_init=False)
    exceeds = False
    for path, kernel, bias in _collect(m_flax.variables['params']):
        bound = np.sqrt(3.0 / _fan_in(kernel.shape))
        if np.abs(kernel).max() > bound:
            exceeds = True
        if bias is not None:
            assert np.all(bias == 0), (path, 'flax default biases are zero')
    assert exceeds, 'torch_init=False did not preserve flax defaults'

    # equal seeds -> identical re-drawn params (rng folded per path)
    a, b = _build(seed=7), _build(seed=7)
    la = jax.tree_util.tree_leaves(a.variables['params'])
    lb = jax.tree_util.tree_leaves(b.variables['params'])
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # and a different seed changes them
    c = _build(seed=8)
    lc = jax.tree_util.tree_leaves(c.variables['params'])
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lc))


def test_init_deterministic_across_processes():
    """Same seed must give bit-identical params in a DIFFERENT process.

    Round-5 regression: the per-path rng fold used Python's hash(), which is
    salted per process (PYTHONHASHSEED) — same-seed inits differed across
    processes, silently breaking multi-host training's replicated-params
    invariant (and same-seed reproducibility in general). The fold now uses
    crc32 (util/init.py).
    """
    import os
    import subprocess
    import sys

    script = (
        # Pin the child to CPU IN-PROCESS: this image's sitecustomize
        # force-registers the axon TPU platform ahead of the JAX_PLATFORMS
        # env var (see tests/conftest.py), so with env alone the child runs
        # on the TPU and its ~1e-8 platform rounding differences fail the
        # bit-equality gate. Same-platform cross-process determinism is the
        # invariant under test.
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from celldetection_tpu import models\n"
        "m = models.CpnU12(in_channels=1, order=3, samples=16, max_detections=64,\n"
        "                  backbone_kwargs=dict(base_channels=16))\n"
        "m.init(jax.random.PRNGKey(7), (1, 32, 32, 1))\n"
        "s = sum(float(np.abs(np.asarray(l, np.float64)).sum())\n"
        "        for l in jax.tree_util.tree_leaves(m.variables['params']))\n"
        "print(f'CHECKSUM={s!r}')\n"
    )
    here = _build(seed=7)
    local = sum(float(np.abs(np.asarray(l, np.float64)).sum())
                for l in jax.tree_util.tree_leaves(here.variables['params']))
    sums = set()
    for hashseed in ('1', '2'):
        env = dict(os.environ, PYTHONHASHSEED=hashseed, JAX_PLATFORMS='cpu')
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
        # generous timeout: the subprocess imports jax and traces an init on a
        # 1-core box that may be running TPU benches concurrently
        proc = subprocess.run([sys.executable, '-c', script], cwd='/root/repo',
                              env=env, capture_output=True, text=True, timeout=1800)
        assert proc.returncode == 0, proc.stderr[-2000:]
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith('CHECKSUM=')][-1]
        sums.add(float(line.split('=', 1)[1]))
    assert sums == {local}, (sums, local)
