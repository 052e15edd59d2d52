"""Generic HDF5-backed dataset.

Behavioral reference: ``celldetection/data/datasets/generic.py:7-51``.
"""
import h5py
import numpy as np

__all__ = ['GenericH5']


class GenericH5:
    """Dataset over one or more keys of an HDF5 file.

    Args:
        filename: Path to .h5 file.
        keys: Key or tuple of keys to read per item.
        transform: Optional callable applied to the tuple of values.
    """

    def __init__(self, filename: str, keys, transform=None):
        self.filename = filename
        self.keys = (keys,) if isinstance(keys, str) else tuple(keys)
        self.transform = transform
        with h5py.File(filename, 'r') as h:
            self._len = len(h[self.keys[0]])

    def __len__(self):
        return self._len

    def __getitem__(self, item):
        with h5py.File(self.filename, 'r') as h:
            values = tuple(np.asarray(h[k][item]) for k in self.keys)
        if self.transform is not None:
            values = self.transform(*values)
        return values
