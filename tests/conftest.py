import os

# Run tests on a virtual 8-device CPU mesh: multi-device sharding paths are
# validated without TPU hardware (capability the torch reference lacks).
# Note: the environment's sitecustomize force-registers the 'axon' TPU
# platform ahead of JAX_PLATFORMS, so the config must be overridden in-process
# after importing jax.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_ENABLE_X64', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'fixtures')


@pytest.fixture(scope='session')
def fixtures_dir():
    return FIXTURES


def load_fixture(name):
    return np.load(os.path.join(FIXTURES, name))
