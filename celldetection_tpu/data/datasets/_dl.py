"""Shared dataset download/extract helper (atomic, idempotent)."""
import os
import zipfile
from urllib.request import urlretrieve

__all__ = ['download_and_extract']


def download_and_extract(url: str, directory: str, extract_to: str = None) -> str:
    """Download ``url`` into ``directory`` and extract it once.

    The download is atomic (.part + rename — an interrupted transfer never
    leaves a truncated file the isfile guard would trust), and extraction is
    guarded by a marker file so repeated dataset constructions don't redo it.
    """
    os.makedirs(directory, exist_ok=True)
    fn = os.path.join(directory, url.rsplit('/', 1)[-1])
    if not os.path.isfile(fn):
        tmp = fn + '.part'
        try:
            urlretrieve(url, tmp)
            os.replace(tmp, fn)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    marker = fn + '.extracted'
    if not os.path.isfile(marker):
        with zipfile.ZipFile(fn) as z:
            z.extractall(extract_to or directory)
        open(marker, 'w').close()
    return fn
