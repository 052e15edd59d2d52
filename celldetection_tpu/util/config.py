"""Config / Schedule / conf2* factories.

Behavioral reference: ``celldetection/util/schedule.py`` — ``conf2call``
(:17), ``conf2optimizer`` (:50), ``conf2scheduler`` (:77), ``Config``
(:132-309), ``Schedule`` (:312-574). Optimizers/schedulers resolve to optax.
"""
import hashlib
import json
from collections import OrderedDict
from itertools import product
from typing import Any, Callable, Dict, Union

import numpy as np

__all__ = ['Config', 'Schedule', 'conf2call', 'conf2optimizer', 'conf2scheduler',
           'conf2tweaks_']


def conf2call(settings: Union[dict, str], origin, **kwargs):
    """Resolve ``{'Name': {kwargs}}`` or ``'Name'`` to ``origin.Name(**kwargs)``.

    ``origin`` may be a module, object, or dict of callables.
    """
    assert len(settings) == 1 or isinstance(settings, str)
    if isinstance(settings, str):
        name, extra = settings, {}
    else:
        name, = settings.keys()
        extra = dict(settings[name]) if settings[name] else {}
    if isinstance(origin, dict):
        fn = origin[name]
    else:
        fn = getattr(origin, name)
    extra.update(kwargs)
    return fn(**extra)


def _optax_registry():
    import optax
    return {
        # torch Adam applies weight decay as L2-into-gradient (before the
        # adaptive moments) — NOT decoupled AdamW
        'Adam': lambda lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0., **kw:
            (optax.chain(optax.add_decayed_weights(weight_decay),
                         optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps))
             if weight_decay else optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)),
        'AdamW': lambda lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **kw:
            optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay),
        'SGD': lambda lr=1e-2, momentum=0., nesterov=False, weight_decay=0., **kw:
            optax.chain(optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
                        optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)),
        'RMSprop': lambda lr=1e-2, alpha=0.99, eps=1e-8, momentum=0., **kw:
            optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None),
        'Adamax': lambda lr=2e-3, betas=(0.9, 0.999), eps=1e-8, **kw:
            optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps),
        'Adadelta': lambda lr=1., rho=0.9, eps=1e-6, weight_decay=0., **kw:
            (optax.chain(optax.add_decayed_weights(weight_decay),
                         optax.adadelta(lr, rho=rho, eps=eps))
             if weight_decay else optax.adadelta(lr, rho=rho, eps=eps)),
        'Adagrad': _adagrad,
    }


def _adagrad(lr=1e-2, eps=1e-10, initial_accumulator_value=0., lr_decay=0., **kw):
    # torch Adagrad initializes the accumulator to initial_accumulator_value
    # (default 0.), not optax's 0.1; lr_decay has no optax equivalent and is
    # rejected rather than silently dropped (ADVICE r4)
    import optax
    if lr_decay:
        raise ValueError('Adagrad lr_decay is not supported by the optax backend')
    return optax.adagrad(lr, eps=eps,
                         initial_accumulator_value=initial_accumulator_value)


def conf2optimizer(settings: dict):
    """Optimizer config → optax GradientTransformation (torch-style names)."""
    return conf2call(settings, _optax_registry())


def _scheduler_registry():
    # jnp ops only: schedules run inside the jitted train step
    # (optax.scale_by_schedule traces them with an abstract step count)
    import jax.numpy as jnp
    return {
        'StepLR': lambda step_size, gamma=0.1, base=1., **kw:
            (lambda step: base * jnp.power(gamma, step // step_size)),
        'ExponentialLR': lambda gamma, base=1., **kw:
            (lambda step: base * jnp.power(gamma, step)),
        'CosineAnnealingLR': lambda T_max, eta_min=0., base=1., **kw:
            (lambda step: eta_min + (base - eta_min) * 0.5 *
             (1 + jnp.cos(jnp.pi * jnp.minimum(step, T_max) / T_max))),
        'WarmupCosine': lambda warmup_steps, total_steps, base=1., eta_min=0., **kw:
            (lambda step: jnp.where(
                step < warmup_steps, base * (step + 1) / max(warmup_steps, 1),
                eta_min + (base - eta_min) * 0.5 *
                (1 + jnp.cos(jnp.pi * jnp.minimum(jnp.maximum(step - warmup_steps, 0),
                                                  total_steps - warmup_steps) /
                             max(total_steps - warmup_steps, 1))))),
    }


def conf2scheduler(settings: dict):
    """Scheduler config → callable ``step -> lr multiplier`` (optax-compatible)."""
    return conf2call(settings, _scheduler_registry())


def conf2tweaks_(settings: dict, model):
    """Apply layer tweaks to a CPN model in place.

    Parity: ``celldetection/util/schedule.py:108`` (``conf2tweaks_`` /
    ``tweak_module_``), which sets attributes on every matching torch
    submodule. Flax modules are constructed inline while tracing, so the
    rebuild stores the overrides on the model (``model.tweaks``) and the CPN
    installs them for every trace (``models/commons.py:norm_overrides``);
    torch momentum is converted to the flax convention (flax = 1 − torch).

    Supported targets: ``BatchNorm2d`` / ``BatchNorm3d`` / ``BatchNorm``
    (``momentum``, ``eps``). Unknown targets raise, like torch's
    ``tweak_module_(must_exist=True)`` would for absent attributes.

    Examples:
        >>> cdt.conf2tweaks_({'BatchNorm2d': dict(momentum=0.05)}, model)
    """
    tweaks = dict(getattr(model, 'tweaks', None) or {})
    for target, kwargs in (settings or {}).items():
        name = target if isinstance(target, str) else getattr(target, '__name__', str(target))
        key = name.lower().replace('_', '')
        if key.startswith('batchnorm'):
            ov = dict(tweaks.get('batchnorm', {}))
            for k, v in kwargs.items():
                if k == 'momentum':
                    ov['momentum'] = 1. - float(v)  # torch → flax convention
                elif k in ('eps', 'epsilon'):
                    ov['epsilon'] = float(v)
                else:
                    raise ValueError(f'Unsupported BatchNorm tweak: {k!r}')
            tweaks['batchnorm'] = ov
        else:
            raise ValueError(f'Unsupported tweak target: {target!r}')
    model.tweaks = tweaks
    # drop stale traces — cached programs baked the previous overrides. The
    # epoch counter also invalidates programs held OUTSIDE the model
    # (CPNTrainer._step_fn, TiledInference._fns), which check it per call
    # (ADVICE r4: tweaks applied mid-training were silently ignored there).
    if hasattr(model, '_jit_cache'):
        model._jit_cache.clear()
    model._tweak_epoch = getattr(model, '_tweak_epoch', 0) + 1
    return model


class Config(dict):
    """Attribute-style config dict with json/yaml IO, hashing, and merging.

    Examples:
        >>> conf = Config(model='CpnU22', optimizer={'Adam': {'lr': 1e-3}})
        >>> conf.model
        'CpnU22'
    """

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.__dict__ = self

    @staticmethod
    def from_json(filename) -> 'Config':
        c = Config()
        c.load_json(filename)
        return c

    @staticmethod
    def from_yaml(filename) -> 'Config':
        c = Config()
        c.load_yaml(filename)
        return c

    def load_json(self, filename):
        with open(filename) as f:
            self.update(json.load(f))

    def to_json(self, filename):
        with open(filename, 'w') as f:
            json.dump(self.to_dict(), f, indent=2, default=_json_default)

    def load_yaml(self, filename):
        import yaml
        with open(filename) as f:
            self.update(yaml.safe_load(f))

    def to_yaml(self, filename):
        import yaml
        with open(filename, 'w') as f:
            yaml.safe_dump(json.loads(json.dumps(self.to_dict(), default=_json_default)), f)

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()
                if not k.startswith('_')}

    def hash(self) -> str:
        return hashlib.md5(json.dumps(self.to_dict(), sort_keys=True,
                                      default=_json_default).encode()).hexdigest()

    def args(self, fn: Callable) -> tuple:
        """Positional args of ``fn`` bound from config entries."""
        import inspect
        sig = inspect.signature(fn)
        return tuple(self[n] for n in sig.parameters if n in self)

    def kwargs(self, fn: Callable) -> dict:
        """Keyword args of ``fn`` bound from config entries."""
        import inspect
        sig = inspect.signature(fn)
        return {n: self[n] for n in sig.parameters if n in self}

    def __str__(self):
        return json.dumps(self.to_dict(), indent=2, default=_json_default)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


class Schedule:
    """Cross-product hyperparameter schedule with conditional settings.

    Examples:
        >>> s = Schedule(lr=(1e-3, 1e-4), batch_size=(8, 16))
        >>> len(s)
        4
        >>> s.add(momentum=(0.9,), conditions={'lr': 1e-3})
    """

    def __init__(self, **kwargs):
        self._settings: list = []
        self._conditions: list = []
        if kwargs:
            self.add(**kwargs)

    def add(self, conditions: Dict[str, Any] = None, **kwargs):
        norm = OrderedDict()
        for k, v in kwargs.items():
            if not isinstance(v, (tuple, list, set)):
                v = (v,)
            norm[k] = tuple(v)
        self._settings.append(norm)
        self._conditions.append(conditions)

    def _iter_configs(self):
        configs = [Config()]
        for settings, conditions in zip(self._settings, self._conditions):
            keys = list(settings.keys())
            new_configs = []
            for conf in configs:
                applies = conditions is None or all(
                    conf.get(k) == v or (isinstance(v, (tuple, list, set)) and conf.get(k) in v)
                    for k, v in conditions.items())
                if applies:
                    for values in product(*settings.values()):
                        c = Config(**conf)
                        c.update(dict(zip(keys, values)))
                        new_configs.append(c)
                else:
                    new_configs.append(conf)
            configs = new_configs
        seen = []
        for c in configs:
            if c not in seen:
                seen.append(c)
        return seen

    def __len__(self):
        return len(self._iter_configs())

    def __iter__(self):
        return iter(self._iter_configs())

    def __getitem__(self, item) -> Config:
        return self._iter_configs()[item]
