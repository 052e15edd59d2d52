"""IO helpers: h5 read/write, yaml/json, image loading.

Behavioral reference: ``celldetection/util/util.py`` — ``to_h5`` (:1357),
``from_h5`` (:1459), ``to_tiff`` (:1491), yaml/json (:1551-1619),
``load_image`` (:658).
"""
import json
from typing import Optional

import numpy as np

__all__ = ['to_h5', 'from_h5', 'to_batched_h5', 'to_json', 'from_json', 'to_yaml',
           'from_yaml', 'load_image', 'to_tiff', 'img_to_base64', 'base64_to_img',
           'image_to_base64', 'base64_to_image', 'glob_h5_split']


def to_h5(filename, mode: str = 'w', compression=None, attributes: Optional[dict] = None,
          **arrays):
    """Write named arrays to an HDF5 file (+ optional root attributes)."""
    import h5py
    with h5py.File(filename, mode) as h:
        for k, v in arrays.items():
            if v is None:
                continue
            if k in h:
                del h[k]
            h.create_dataset(k, data=np.asarray(v), compression=compression)
        if attributes:
            for k, v in attributes.items():
                h.attrs[k] = v


def from_h5(filename, *keys):
    """Read arrays (all keys if none given)."""
    import h5py
    with h5py.File(filename, 'r') as h:
        if not keys:
            keys = list(h.keys())
        out = tuple(np.asarray(h[k]) for k in keys)
    return out[0] if len(out) == 1 else out


def to_batched_h5(filename, mode: str = 'a', **ragged):
    """Append ragged per-item arrays as numbered h5 groups.

    Parity: ``celldetection/util/util.py:1402`` (batched h5). Each call
    appends one batch item per key under ``<key>/<index>``.
    """
    import h5py
    with h5py.File(filename, mode) as h:
        for key, items in ragged.items():
            grp = h.require_group(key)
            start = len(grp)
            for i, item in enumerate(items):
                grp.create_dataset(str(start + i), data=np.asarray(item))


def img_to_base64(image: np.ndarray, fmt: str = 'png') -> str:
    """Encode an image array to a base64 string (parity: util :1789-1833)."""
    import base64
    import io as _io
    from imageio.v2 import imwrite
    buf = _io.BytesIO()
    imwrite(buf, image, format=fmt)
    return base64.b64encode(buf.getvalue()).decode()


def base64_to_img(data: str) -> np.ndarray:
    import base64
    import io as _io
    from imageio.v2 import imread
    return np.asarray(imread(_io.BytesIO(base64.b64decode(data))))


def to_json(filename, obj):
    with open(filename, 'w') as f:
        json.dump(obj, f, indent=2, default=str)


def from_json(filename):
    with open(filename) as f:
        return json.load(f)


def to_yaml(filename, obj):
    import yaml
    with open(filename, 'w') as f:
        yaml.safe_dump(obj, f)


def from_yaml(filename):
    import yaml
    with open(filename) as f:
        return yaml.safe_load(f)


def load_image(filename, method: str = 'imageio', separator: str = '::',
               dataset: Optional[str] = None) -> np.ndarray:
    """Load an image file (tiff/png/jpg/...) or an ``.h5<separator>key`` ref.

    Args:
        method: Reading backend for plain images — 'imageio' (default) or
            'tifffile' (parity: CLI ``--inputs_method``).
        separator: h5 key separator (parity: CLI ``--separator``).
        dataset: Default h5 key for ``.h5`` inputs given without a key
            (parity: CLI ``--inputs_dataset``).
    """
    name = str(filename)
    if '.h5' in name:
        if separator in name:
            fn, key = name.rsplit(separator, 1)
            if fn.endswith('.h5'):
                return from_h5(fn, key)
        if name.endswith('.h5') and dataset is not None:
            return from_h5(name, dataset)
    if method == 'tifffile':
        import tifffile
        return np.asarray(tifffile.imread(name))
    from imageio.v2 import imread
    return np.asarray(imread(name))


def to_tiff(filename, image: np.ndarray, bigtiff: bool = True, **kwargs):
    """Write a (large) image as TIFF; ZLIB-compressed bigtiff when available."""
    try:
        import tifffile
        tifffile.imwrite(filename, image, bigtiff=bigtiff, compression='zlib', **kwargs)
    except ImportError:
        from imageio.v2 import imwrite
        imwrite(filename, image)


# Reference spellings (celldetection/util/util.py)
def image_to_base64(image, fmt: str = 'png') -> str:
    return img_to_base64(image, fmt)


def base64_to_image(data: str):
    return base64_to_img(data)


def glob_h5_split(pathname: str, ext: str = '-r.h5', **kwargs):
    """Glob split-HDF5 families, returning names without the split appendix
    (what ``h5py`` family drivers expect — parity: ``glob_h5_split``,
    ``celldetection/util/util.py:1983``)."""
    import glob as _glob
    pattern = pathname if pathname.endswith(ext) else pathname + ext
    return [f[:-len(ext)] for f in _glob.glob(pattern, **kwargs)]
