"""Headless notebook runner (no jupyter needed): exec the code cells in order.

Usage: python demos/run_notebook.py demos/demo-binary-tpu.ipynb

Used by tests/test_demo_notebook.py with ``DEMO_FAST=1`` to keep the demo
executable end-to-end as the library evolves.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(path, workdir=None):
    os.environ.setdefault('MPLBACKEND', 'Agg')
    with open(path) as f:
        nb = json.load(f)
    if workdir:
        os.makedirs(workdir, exist_ok=True)
        os.chdir(workdir)
    ns = {'__name__': '__demo__'}
    for i, cell in enumerate(nb['cells']):
        if cell['cell_type'] != 'code':
            continue
        src = ''.join(cell['source'])
        print(f'--- cell {i} ---', flush=True)
        exec(compile(src, f'{os.path.basename(path)}:cell{i}', 'exec'), ns)
    print('notebook OK')


if __name__ == '__main__':
    run(os.path.abspath(sys.argv[1]),
        workdir=sys.argv[2] if len(sys.argv) > 2 else None)
