"""Torch-free reader for PyTorch ``.pt``/``.ckpt`` checkpoints.

A TPU-native deployment should not need the torch package to ingest the
hosted reference models (cd format, ``celldetection/util/util.py:464-560``).
PyTorch's modern serialization format is a plain zip archive holding one
``data.pkl`` pickle (tensor payloads replaced by persistent-id references)
plus one raw little-endian buffer per storage under ``data/<key>``. This
module re-implements exactly that contract:

  - a *restricted* unpickler: only the torch rebuild helpers, container
    types and numpy scalars are resolved to real callables; any other global
    (e.g. reference model classes) deserializes to an inert named placeholder
    so untrusted pickles cannot execute arbitrary code,
  - storages load lazily as 1-D numpy arrays (bfloat16 via ``ml_dtypes``),
  - ``_rebuild_tensor_v2`` materializes views with ``as_strided`` + copy.

Legacy (pre-1.6, non-zip) files are not handled here — ``load_pt`` raises
and the caller may fall back to torch if it is installed.
"""
import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

__all__ = ['load_pt', 'PTUnpickleError']


class PTUnpickleError(RuntimeError):
    pass


def _np_dtype(storage_name: str):
    table = {
        'DoubleStorage': np.float64, 'FloatStorage': np.float32,
        'HalfStorage': np.float16, 'LongStorage': np.int64,
        'IntStorage': np.int32, 'ShortStorage': np.int16,
        'CharStorage': np.int8, 'ByteStorage': np.uint8,
        'BoolStorage': np.bool_, 'ComplexFloatStorage': np.complex64,
        'ComplexDoubleStorage': np.complex128,
    }
    if storage_name in table:
        return np.dtype(table[storage_name])
    if storage_name == 'BFloat16Storage':
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    raise PTUnpickleError(f'unsupported torch storage type: {storage_name}')


class _StorageType:
    """Stand-in for ``torch.FloatStorage`` etc. appearing in persistent ids."""

    def __init__(self, name):
        self.name = name

    @property
    def dtype(self):
        return _np_dtype(self.name)


class _Placeholder:
    """Inert stand-in for globals we refuse to resolve (never instantiated)."""

    def __init__(self, module, name):
        self.__module__ = module
        self.__name__ = name

    def __call__(self, *a, **k):
        raise PTUnpickleError(
            f'checkpoint pickle tried to call {self.__module__}.{self.__name__}; '
            f'refusing (torch-free restricted unpickler)')

    def __repr__(self):
        return f'<pt-placeholder {self.__module__}.{self.__name__}>'


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    """Numpy twin of ``torch._utils._rebuild_tensor_v2``."""
    flat = storage[storage_offset:]
    if not size:
        return flat[:1].reshape(()).copy()
    itemsize = flat.dtype.itemsize
    strides = tuple(int(s) * itemsize for s in stride)
    arr = np.lib.stride_tricks.as_strided(flat, shape=tuple(int(s) for s in size),
                                          strides=strides)
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


_REBUILDERS = {
    '_rebuild_tensor_v2': _rebuild_tensor_v2,
    '_rebuild_tensor': lambda storage, offset, size, stride: _rebuild_tensor_v2(
        storage, offset, size, stride),
    '_rebuild_parameter': _rebuild_parameter,
}


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file, encoding='utf-8')
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == 'torch._utils' and name in _REBUILDERS:
            return _REBUILDERS[name]
        if module in ('torch', 'torch.storage') and name.endswith('Storage'):
            return _StorageType(name)
        if module == 'torch' and name == 'Size':
            return tuple
        if module == 'torch' and name.endswith('dtype'):
            return _Placeholder(module, name)
        if module == 'collections' and name == 'OrderedDict':
            return OrderedDict
        if module == '_codecs' and name == 'encode':
            import codecs  # numpy scalar payloads pickle as _codecs.encode
            return codecs.encode
        if module.split('.')[0] == 'numpy':
            # numpy scalars/dtypes legitimately appear in hparams kwargs
            import importlib
            try:
                obj = importlib.import_module(module)
                for part in name.split('.'):
                    obj = getattr(obj, part)
                return obj
            except (ImportError, AttributeError):
                return _Placeholder(module, name)
        return _Placeholder(module, name)

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        if not (isinstance(pid, tuple) and len(pid) >= 5 and pid[0] == 'storage'):
            raise PTUnpickleError(f'unsupported persistent id: {pid!r}')
        _, storage_type, key, _location, numel = pid[:5]
        if isinstance(storage_type, _StorageType):
            dtype = storage_type.dtype
        else:
            dtype = _np_dtype(getattr(storage_type, '__name__', str(storage_type)))
        return self._read_storage(str(key), dtype, int(numel))


def load_pt(filename: str):
    """Load a PyTorch zip-format checkpoint without torch.

    Returns the pickled object tree with every tensor as a numpy array
    (shape/strides resolved; bfloat16 as ``ml_dtypes.bfloat16``).
    """
    if not zipfile.is_zipfile(filename):
        raise PTUnpickleError(
            f'{filename}: not a zip-format torch checkpoint (legacy pre-1.6 '
            f'format needs the torch package)')
    with zipfile.ZipFile(filename) as zf:
        names = zf.namelist()
        pkl_candidates = [n for n in names if n.split('/')[-1] == 'data.pkl']
        if not pkl_candidates:
            raise PTUnpickleError(f'{filename}: no data.pkl in archive')
        pkl_name = min(pkl_candidates, key=len)
        prefix = pkl_name[:-len('data.pkl')]
        storage_dir = f'{prefix}data/'
        cache = {}

        def read_storage(key, dtype, numel):
            got = cache.get(key)
            if got is None or got.dtype != dtype:
                raw = zf.read(storage_dir + key)
                got = np.frombuffer(raw, dtype=dtype, count=numel)
                cache[key] = got
            return got

        with zf.open(pkl_name) as f:
            return _Unpickler(io.BytesIO(f.read()), read_storage).load()
