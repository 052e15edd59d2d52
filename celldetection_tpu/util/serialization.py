"""Model serialization: the cdt checkpoint format + hosted-model fetch.

Behavioral reference: ``celldetection/util/util.py`` — ``dict2model`` (:373),
``load_model`` (:474), ``fetch_model`` (:482), ``model2dict`` (:527),
``save_fetchable_model`` (:545), ``append_hash_to_filename`` (:512),
``hash_file`` (:1884); hosted table ``celldetection/models/hosted.py``.

The cdt format is a single ``.npz``-style msgpack file holding
``{'cdt.models': {'model': ClassName, 'kwargs': ...}, 'params': <flax tree>,
'state': <batch_stats tree>, 'cdt.__version__': ...}``. Filenames may carry a
sha256 prefix for integrity-checked hosting (``fetch_model(check_hash=True)``).
"""
import hashlib
import json
import os
from typing import Optional

import numpy as np

__all__ = ['model2dict', 'dict2model', 'save_model', 'load_model', 'fetch_model',
           'save_fetchable_model', 'append_hash_to_filename', 'hash_file', 'hosted_models']

# Hosted model table (parity: celldetection/models/hosted.py). Downloads
# require egress; in offline environments pass a local path instead.
hosted_models = {
    'ginoro_CpnResNeXt101UNet-fbe875f1b3e5ce2c': (
        'https://celldetection.org/torch/models/ginoro_CpnResNeXt101UNet-fbe875f1b3e5ce2c.pt'),
}


def model2dict(model) -> dict:
    """CPN model → serializable dict (architecture + parameters).

    Mutable runtime settings (thresholds, samples, capacity) are captured at
    their *current* values — parity with the reference's ``updated_kwargs``
    (``celldetection/util/util.py:527-543``).
    """
    from flax import serialization
    hparams = {k: v for k, v in model.hparams.items()}
    for attr in ('score_thresh', 'nms_thresh', 'samples', 'order', 'certainty_thresh',
                 'max_detections', 'refinement_iterations'):
        if hasattr(model, attr):
            hparams[attr] = getattr(model, attr)
    return {
        'cdt.models': {'model': hparams.get('model'), 'kwargs': hparams},
        'params_bytes': serialization.to_bytes(model.variables),
        'cdt.__version__': _version(),
    }


def _version():
    from ..__meta__ import __version__
    return __version__


def dict2model(d: dict, **overrides):
    """Rebuild a model from a cdt-format dict (class-name lookup in the zoo)."""
    from flax import serialization
    from ..models import get_cpn
    info = d['cdt.models']
    kwargs = dict(info['kwargs'])
    override_name = overrides.pop('model', None)
    stored_name = kwargs.pop('model', None)  # pop unconditionally: a stale
    name = override_name or stored_name or info.get('model')  # name must not
    if not isinstance(name, str):                             # reach the ctor
        name = getattr(name, '__name__', str(name))
    kwargs.update(overrides)
    in_channels = kwargs.pop('in_channels')
    backbone_kwargs = kwargs.pop('backbone_kwargs', None)
    ctor = get_cpn(name)
    import inspect
    sig = inspect.signature(ctor)
    accepted = {k: v for k, v in kwargs.items()
                if k in sig.parameters or any(p.kind == p.VAR_KEYWORD
                                              for p in sig.parameters.values())}
    model = ctor(in_channels, backbone_kwargs=backbone_kwargs, **accepted)
    if 'params_bytes' in d:
        input_shape = kwargs.get('input_shape')
        if input_shape is None:
            # template rank follows the model dimensionality (nd=3 models
            # need a volumetric init input)
            nd = (backbone_kwargs or {}).get('nd', 2)
            spatial = (32,) * nd if nd != 2 else (128, 128)
            input_shape = (1,) + spatial + (in_channels,)
        template = model.init(input_shape=tuple(input_shape))
        model.variables = serialization.from_bytes(template, d['params_bytes'])
    return model


def _json_safe(o):
    """JSON fallback: numpy scalars become numbers (a blanket str() would
    reload e.g. score_thresh as the string \"0.86\")."""
    import numpy as _np
    if isinstance(o, (_np.floating, _np.integer, _np.bool_)):
        return o.item()
    if isinstance(o, _np.ndarray):
        return o.tolist()
    return str(o)


def save_model(filename: str, model, meta: Optional[dict] = None):
    """Save a model in cdt format (msgpack inside a single file)."""
    import msgpack
    d = model2dict(model)
    payload = {
        'cdt.models': json.dumps(d['cdt.models'], default=_json_safe),
        'params_bytes': d['params_bytes'],
        'cdt.__version__': d['cdt.__version__'],
        'meta': json.dumps(meta or {}, default=_json_safe),
    }
    with open(filename, 'wb') as f:
        f.write(msgpack.packb(payload))
    return filename


def load_model_meta(filename: str) -> dict:
    """Read the metadata written by ``save_model`` (incl. the saving
    package version under ``'cdt.__version__'``) without building the model."""
    import msgpack
    with open(filename, 'rb') as f:
        payload = msgpack.unpackb(f.read(), strict_map_key=False)
    meta = json.loads(payload.get('meta') or '{}')
    meta.setdefault('cdt.__version__', payload.get('cdt.__version__'))
    return meta


def load_model(filename: str, **overrides):
    """Load a cdt-format model file (or a torch ``.pt`` via the adapter)."""
    if filename.endswith('.pt') or filename.endswith('.ckpt'):
        from .torch_import import load_torch_cd_model
        return load_torch_cd_model(filename, **overrides)
    import msgpack
    with open(filename, 'rb') as f:
        payload = msgpack.unpackb(f.read(), strict_map_key=False)
    d = {
        'cdt.models': json.loads(payload['cdt.models']),
        'params_bytes': payload['params_bytes'],
    }
    return dict2model(d, **overrides)


def hash_file(filename: str, algorithm: str = 'sha256', chunk: int = 2 ** 20) -> str:
    h = hashlib.new(algorithm)
    with open(filename, 'rb') as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def append_hash_to_filename(filename: str, digits: int = 16) -> str:
    """Rename ``name.ext`` → ``name-<hash16>.ext`` (fetchable-model convention)."""
    h = hash_file(filename)[:digits]
    base, ext = os.path.splitext(filename)
    new = f'{base}-{h}{ext}'
    os.replace(filename, new)
    return new


def save_fetchable_model(filename: str, model, **kwargs):
    """Save + hash-stamp a model for hosting."""
    save_model(filename, model, **kwargs)
    return append_hash_to_filename(filename)


def fetch_model(name: str, cache_dir: Optional[str] = None, check_hash: bool = True,
                **overrides):
    """Fetch a hosted model by name or URL (``cd://name`` also accepted).

    Note: requires network egress; with a local file path this is
    equivalent to :func:`load_model`.
    """
    if os.path.isfile(name):
        return load_model(name, **overrides)
    if name.startswith('cd://'):
        name = name[5:]
    url = hosted_models.get(name, name)
    if not (url.startswith('http://') or url.startswith('https://')):
        raise ValueError(f'Unknown hosted model and not a URL/path: {name}')
    cache_dir = cache_dir or os.path.join(os.path.expanduser('~'), '.cache', 'celldetection_tpu')
    os.makedirs(cache_dir, exist_ok=True)
    fn = os.path.join(cache_dir, url.rsplit('/', 1)[-1])
    if not os.path.isfile(fn):
        from urllib.request import urlretrieve
        # atomic download: a dropped connection must not leave a partial
        # file that every later call would reuse
        tmp = fn + '.part'
        try:
            urlretrieve(url, tmp)
            os.replace(tmp, fn)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    if check_hash and '-' in os.path.basename(fn):
        expected = os.path.splitext(os.path.basename(fn))[0].rsplit('-', 1)[-1]
        actual = hash_file(fn)[:len(expected)]
        if expected != actual and len(expected) >= 8:
            os.remove(fn)  # force a clean re-fetch next time
            raise RuntimeError(f'Hash mismatch for {fn} (corrupt download '
                               f'removed): {actual} != {expected}')
    return load_model(fn, **overrides)
