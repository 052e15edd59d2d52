"""System/device infra: seeding, device stats, OOM retry, size formatting.

Behavioral reference: ``celldetection/util/util.py`` — ``random_seed`` (:696),
``GpuStats`` (:1166, pynvml), ``OomCatcher`` (:2180), ``Bytes``/``Percent``
(:1133-1165), ``get_total_memory`` (:1662), random-state save/load
(:2252-2333). TPU equivalents use ``device.memory_stats()``.
"""
import os
import pickle
import random
import numpy as np

__all__ = ['random_seed', 'Bytes', 'Percent', 'TpuStats', 'GpuStats', 'OomCatcher',
           'get_total_memory', 'save_random_states', 'load_random_states',
           'num_bytes', 'get_random_states']


def num_bytes(x) -> int:
    """Size in bytes of an ndarray / jax array (parity: ``num_bytes``,
    ``celldetection/util/util.py:1678``)."""
    shape = np.shape(x)
    itemsize = getattr(getattr(x, 'dtype', None), 'itemsize', None)
    if itemsize is None:
        itemsize = np.asarray(x).dtype.itemsize
    return int(np.prod(shape)) * int(itemsize)


def get_random_states() -> dict:
    """Current host RNG states as a dict (parity: ``get_random_states``)."""
    return {'random': random.getstate(), 'numpy': np.random.get_state()}


def random_seed(seed: int, deterministic: bool = True):
    """Seed host RNGs; returns a jax PRNGKey for device randomness."""
    import jax
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class Bytes(int):
    """Integer byte count with human-readable repr."""

    def __str__(self):
        v = float(self)
        for unit in ('B', 'KiB', 'MiB', 'GiB', 'TiB'):
            if abs(v) < 1024 or unit == 'TiB':
                return f'{v:.2f} {unit}'
            v /= 1024
        return f'{v:.2f} TiB'

    __repr__ = __str__


class Percent(float):
    def __str__(self):
        return f'{float(self) * 100:.1f}%'

    __repr__ = __str__


class TpuStats:
    """Live accelerator memory telemetry (``device.memory_stats``)."""

    def __init__(self, devices=None):
        import jax
        self.devices = devices or jax.local_devices()

    def dict(self) -> dict:
        out = {}
        for i, d in enumerate(self.devices):
            stats = d.memory_stats() or {}
            used = stats.get('bytes_in_use', 0)
            limit = stats.get('bytes_limit', 0)
            out[f'dev{i}_used'] = Bytes(used)
            if limit:
                out[f'dev{i}_util'] = Percent(used / limit)
        return out

    def __str__(self):
        return ', '.join(f'{k}={v}' for k, v in self.dict().items())


GpuStats = TpuStats  # API-compatibility alias


def get_total_memory(device=None) -> int:
    """Total accelerator memory of a device (bytes)."""
    import jax
    device = device or jax.local_devices()[0]
    stats = device.memory_stats() or {}
    return Bytes(stats.get('bytes_limit', 0))


class OomCatcher:
    """Retry context for OOM errors with a shrinking batch hint.

    Examples:
        >>> catcher = OomCatcher(attempts=3)
        >>> for batch_size in catcher:               # doctest: +SKIP
        ...     with catcher:
        ...         run(batch_size)
    """

    def __init__(self, attempts: int = 3, factor: float = 0.5, initial: int = None,
                 verbose: bool = True):
        self.attempts = attempts
        self.factor = factor
        self.initial = initial
        self.verbose = verbose
        self._attempt = 0
        self.ok = False

    def __iter__(self):
        size = self.initial
        while self._attempt < self.attempts and not self.ok:
            yield size
            if size is not None and not self.ok:
                size = max(1, int(size * self.factor))

    def __enter__(self):
        self._attempt += 1
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc is None:
            self.ok = True
            return False
        is_oom = 'RESOURCE_EXHAUSTED' in str(exc) or 'out of memory' in str(exc).lower()
        if is_oom and self._attempt < self.attempts:
            if self.verbose:
                print(f'OomCatcher: OOM on attempt {self._attempt}, retrying.')
            return True  # swallow and retry
        return False


def save_random_states(filename: str, jax_key=None):
    """Persist host RNG states (+ optional jax key) for reproducible resume."""
    state = {'random': random.getstate(), 'numpy': np.random.get_state()}
    if jax_key is not None:
        import jax
        state['jax'] = np.asarray(jax.random.key_data(jax_key)).tolist()
    with open(filename, 'wb') as f:
        pickle.dump(state, f)


def load_random_states(filename: str):
    """Restore host RNG states; returns the jax key if one was saved."""
    with open(filename, 'rb') as f:
        state = pickle.load(f)
    random.setstate(state['random'])
    np.random.set_state(state['numpy'])
    if 'jax' in state:
        import jax
        import jax.numpy as jnp
        return jax.random.wrap_key_data(jnp.asarray(state['jax'], jnp.uint32))
    return None
