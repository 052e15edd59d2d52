"""Optimizers & LR schedules (optax).

Behavioral reference: ``celldetection/optim/lr_scheduler.py`` — ``WarmUp``
(:17, linear MultiplicativeLR warmup), patched ``SequentialLR`` (:77),
``ReduceLROnPlateau`` with warmup grace (:99); plus the world-size LR scaling
of ``celldetection/models/lightning_base.py:31,397-440``.
"""
from typing import Callable, Sequence

import numpy as np
import optax

__all__ = ['warmup_schedule', 'sequential_schedule', 'ReduceLROnPlateau',
           'resolve_rank_factor', 'scaled_lr', 'get_warmup_factor', 'WarmUp', 'SequentialLR']


def get_warmup_factor(step: int, steps: int = 1000, factor: float = 0.001,
                      method: str = 'linear') -> float:
    """Warmup multiplier at ``step`` (parity: ``get_warmup_factor``,
    ``celldetection/util/util.py:1646``)."""
    if step >= steps:
        return 1.
    if method == 'constant':
        return factor
    if method == 'linear':
        a = step / steps
        return factor * (1 - a) + a
    raise ValueError(f'Unknown method: {method}')


def warmup_schedule(steps: int, base: float = 1.0) -> Callable[[int], float]:
    """Linear warmup multiplier: step/steps ramp to ``base`` (parity: WarmUp).

    jnp ops only — the schedule is traced inside the jitted train step
    (``CPNTrainer`` wraps it in ``optax.scale_by_schedule``), so the step
    argument is an abstract tracer (ADVICE r4)."""
    import jax.numpy as jnp

    def fn(step):
        return base * jnp.minimum((step + 1) / max(steps, 1), 1.0)
    return fn


def sequential_schedule(schedules: Sequence[Callable[[int], float]],
                        milestones: Sequence[int]) -> Callable[[int], float]:
    """Chain schedules at step milestones (parity: SequentialLR).

    Traceable inside jit: every branch schedule is evaluated and the active
    one selected with ``jnp.select`` — no data-dependent Python control flow
    (ADVICE r4)."""
    import jax.numpy as jnp
    milestones = list(milestones)
    starts = [0] + milestones  # schedule i starts at starts[i]

    def fn(step):
        step = jnp.asarray(step)
        vals = [jnp.asarray(s(step - st), jnp.float32)
                for s, st in zip(schedules, starts)]
        # active index = searchsorted(milestones, step, side='right');
        # select the first condition that holds, scanning from the last
        # schedule backwards so earlier milestones take precedence
        conds = [step < m for m in milestones] + [jnp.asarray(True)]
        return jnp.select(conds, vals)
    return fn


class ReduceLROnPlateau:
    """Host-side plateau LR controller with warmup grace period.

    Call ``factor = ctrl.step(metric)`` each eval; multiply the LR by the
    returned cumulative factor.
    """

    def __init__(self, factor: float = 0.1, patience: int = 10, mode: str = 'min',
                 min_lr_factor: float = 1e-4, warmup_grace: int = 0, threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.min_lr_factor = min_lr_factor
        self.warmup_grace = warmup_grace
        self.threshold = threshold
        self.best = None
        self.bad_epochs = 0
        self.current = 1.0
        self._steps = 0

    def step(self, metric: float) -> float:
        self._steps += 1
        if self._steps <= self.warmup_grace:
            return self.current
        better = (self.best is None or
                  (self.mode == 'min' and metric < self.best - self.threshold) or
                  (self.mode == 'max' and metric > self.best + self.threshold))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.current = max(self.current * self.factor, self.min_lr_factor)
                self.bad_epochs = 0
        return self.current


def resolve_rank_factor(factor, world_size: int) -> float:
    """LR scaling by world size: 'sqrt' | 'linear' | float (parity:
    ``lightning_base.py:31-56``)."""
    if factor == 'sqrt':
        return float(np.sqrt(world_size))
    if factor == 'linear':
        return float(world_size)
    return float(factor)


def scaled_lr(lr: float, world_size: int, rank_factor='sqrt') -> float:
    return lr * resolve_rank_factor(rank_factor, world_size)


# Reference class spellings (celldetection/optim)
WarmUp = warmup_schedule
SequentialLR = sequential_schedule
