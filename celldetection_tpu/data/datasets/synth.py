"""Synthetic dataset splits.

Role parity: ``celldetection/data/datasets/synth.py:10-60`` (hosted synth.zip)
— here generated locally via :mod:`celldetection_tpu.data.toydata` so it works
offline and deterministically.
"""
from ..toydata import random_geometric_objects

__all__ = ['SynthTrain', 'SynthVal', 'SynthTest', 'download_synth']


def download_synth(directory: str, url: str = 'https://celldetection.org/data/synth.zip'):
    """Download and extract the hosted Synth dataset (parity:
    ``celldetection/data/datasets/synth.py:10``). The in-memory generated
    splits above need no download; this fetches the reference's fixed copy."""
    from ._dl import download_and_extract
    download_and_extract(url, directory)


class _Synth:
    # bases far apart so large n never overlaps split seed ranges (train
    # seeds 0..n-1 duplicating val items would leak the validation set)
    SEEDS = {'train': 0, 'val': 1 << 28, 'test': 1 << 29}

    def __init__(self, n: int = 32, height: int = 256, width: int = 256, mode: str = 'train', **kwargs):
        base = self.SEEDS[mode]
        self.items = [random_geometric_objects(height, width, seed=base + i, **kwargs) for i in range(n)]

    def __getitem__(self, item):
        image, labels = self.items[item]
        return image, labels

    def __len__(self):
        return len(self.items)


class SynthTrain(_Synth):
    def __init__(self, n=32, **kwargs):
        super().__init__(n=n, mode='train', **kwargs)


class SynthVal(_Synth):
    def __init__(self, n=8, **kwargs):
        super().__init__(n=n, mode='val', **kwargs)


class SynthTest(_Synth):
    def __init__(self, n=8, **kwargs):
        super().__init__(n=n, mode='test', **kwargs)
