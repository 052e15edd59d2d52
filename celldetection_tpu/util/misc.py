"""Small infra helpers.

Behavioral reference: ``celldetection/util/util.py`` — ``copy_script`` (:50),
``random_code_name`` (:563), ``grouped_glob`` (:1847), ``import_file``
(:1928), ``parse_url_params`` (:2012), installed-package helpers
(:2037-2157), ``say_goodbye`` (:2000).
"""
import glob as glob_mod
import importlib.util
import os
import random
import shutil
import sys
from typing import List
from urllib.parse import parse_qs, urlparse

__all__ = ['copy_script', 'random_code_name', 'grouped_glob', 'import_file',
           'parse_url_params', 'get_installed_packages', 'say_goodbye']

_CONSONANTS = 'bcdfghjklmnprstvwz'
_VOWELS = 'aeiou'


def copy_script(dst_dir: str, script: str = None) -> str:
    """Copy the running script into ``dst_dir`` (experiment provenance)."""
    script = script or os.path.abspath(sys.argv[0])
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(script))
    shutil.copy2(script, dst)
    return dst


def random_code_name(length: int = 6, rng=None) -> str:
    """Pronounceable random code name (e.g. 'betoka')."""
    rng = rng or random
    out = []
    for i in range(length):
        out.append(rng.choice(_CONSONANTS if i % 2 == 0 else _VOWELS))
    return ''.join(out)


def grouped_glob(*patterns: str) -> List[List[str]]:
    """Glob several patterns, returning aligned (sorted) groups."""
    groups = [sorted(glob_mod.glob(p)) for p in patterns]
    lens = {len(g) for g in groups}
    if len(lens) > 1:
        raise ValueError(f'Glob groups differ in length: {[len(g) for g in groups]}')
    return groups


def import_file(path: str, name: str = None):
    """Import a python file as a module."""
    name = name or os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def parse_url_params(url: str) -> dict:
    """URL → (flat) query-parameter dict."""
    q = parse_qs(urlparse(url).query)
    return {k: (v[0] if len(v) == 1 else v) for k, v in q.items()}


def get_installed_packages() -> dict:
    """Installed package versions (for experiment records)."""
    from importlib.metadata import distributions
    return {d.metadata['Name']: d.version for d in distributions()
            if d.metadata and 'Name' in d.metadata}


def say_goodbye() -> str:
    farewells = ('Goodbye', 'So long', 'Farewell', 'Bye', 'Take care',
                 'See you', 'Cheerio', 'Auf Wiedersehen')
    return f'{random.choice(farewells)}!'
