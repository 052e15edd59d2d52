"""Timing utilities with device synchronization.

Behavioral reference: ``celldetection/util/timer.py:61-87`` (keyword timers
with ``torch.cuda.synchronize``). TPU equivalent: ``block_until_ready`` on a
probe value + ``jax.profiler`` hooks.
"""
import time
from contextlib import contextmanager

import jax

__all__ = ['start_timer', 'stop_timer', 'timed', 'Timer', 'profiler_trace', 'print_timing']


def print_timing(name: str, seconds: float):
    """Human-scaled aligned timing line (parity: ``print_timing``,
    ``celldetection/util/timer.py:37``)."""
    for unit, scale in (('s', 1.), ('ms', 1e3), ('us', 1e6)):
        if seconds * scale >= 1 or unit == 'us':
            val = round(seconds * scale, 3)
            print(f'{name}:'.ljust(76 - len(str(val))), val, unit)
            return

_TIMERS = {}


def _sync():
    # Block until pending device work completes: a jitted no-op program is
    # enqueued on the device execution stream AFTER previously dispatched
    # programs, so blocking on it orders after them (a bare device_put
    # transfer does not — transfers ride a separate stream).
    import jax.numpy as jnp
    jax.jit(lambda: jnp.zeros(()))().block_until_ready()


def start_timer(key: str = 'default', cuda: bool = True):
    """Start (or restart) a named timer; syncs the device first."""
    if cuda:
        _sync()
    _TIMERS[key] = time.perf_counter()


def stop_timer(key: str = 'default', cuda: bool = True, verbose: bool = True) -> float:
    """Stop a named timer and return elapsed seconds."""
    if cuda:
        _sync()
    delta = time.perf_counter() - _TIMERS.pop(key)
    if verbose:
        print(f'{key}: {delta * 1e3:.3f} ms')
    return delta


@contextmanager
def timed(key: str = 'default', verbose: bool = True):
    start_timer(key)
    try:
        yield
    finally:
        stop_timer(key, verbose=verbose)


@contextmanager
def profiler_trace(log_dir: str = 'profiles', host_profile: bool = False):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto).

    The TPU analogue of the reference's CUDA-synchronized keyword timers +
    pynvml telemetry (``celldetection/util/timer.py``, ``GpuStats``): one
    context records device timelines, HLO ops, and memory events.
    """
    import jax.profiler
    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        yield
    if host_profile:
        print(f'profiler trace written to {log_dir}')


class Timer:
    """Context timer: ``with Timer('fwd') as t: ...; t.seconds``."""

    def __init__(self, name: str = 'timer', sync: bool = True, verbose: bool = False):
        self.name = name
        self.sync = sync
        self.verbose = verbose
        self.seconds = None

    def __enter__(self):
        if self.sync:
            _sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            _sync()
        self.seconds = time.perf_counter() - self._t0
        if self.verbose:
            print(f'{self.name}: {self.seconds * 1e3:.3f} ms')
