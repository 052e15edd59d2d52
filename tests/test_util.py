"""Tests: tiling math, config/schedule, IO helpers."""
import os

import numpy as np
import pytest

from celldetection_tpu import util
from celldetection_tpu.util import Config, Schedule, Tiling, get_tiling_slices


def test_get_tiling_slices_cover_and_align():
    slices, shape = get_tiling_slices((100, 100), 64, 48)
    slices = list(slices)
    assert shape == (2, 2) and len(slices) == 4
    # edge tiles align to image edge (stop-anchored)
    ys = {(s[0].start, s[0].stop) for s in slices}
    assert (0, 64) in ys and (36, 100) in ys
    # full coverage
    cover = np.zeros((100, 100), bool)
    for sy, sx in slices:
        cover[sy, sx] = True
    assert cover.all()


def test_get_tiling_slices_overlaps():
    slices, overlaps, shape = get_tiling_slices((100,), 64, 48, return_overlaps=True)
    ovs = [o[0] for o in overlaps]
    # first tile: no start overlap; overlap between tiles = 64 - 48 + edge shift
    assert ovs[0][0] == 0
    assert ovs[0][1] == ovs[1][0]  # end overlap of tile i == start overlap of tile i+1
    assert ovs[-1][1] == 0


def test_tiling_class():
    t = Tiling((64, 64), (100, 100), overlap=8)
    assert len(t) == 4
    item = t[0]
    assert item['slices'] == (slice(0, 64), slice(0, 64))
    assert item['slices_with_overlap'] == (slice(0, 72), slice(0, 72))
    with pytest.raises(IndexError):
        t[4]


def test_small_image_single_tile():
    slices, shape = get_tiling_slices((50, 50), 64, 48)
    slices = list(slices)
    assert len(slices) == 1
    assert slices[0][0] == slice(0, 50)


def test_config_roundtrip(tmp_path):
    c = Config(model='CpnU22', lr=1e-3, nested={'a': 1})
    assert c.model == 'CpnU22'
    c.to_json(str(tmp_path / 'c.json'))
    c2 = Config.from_json(str(tmp_path / 'c.json'))
    assert c2.model == 'CpnU22' and c2.lr == 1e-3
    c.to_yaml(str(tmp_path / 'c.yaml'))
    c3 = Config.from_yaml(str(tmp_path / 'c.yaml'))
    assert c3.model == 'CpnU22'
    assert isinstance(c.hash(), str) and len(c.hash()) == 32


def test_config_kwargs_binding():
    def fn(model, lr=1.0, missing=None):
        return model, lr

    c = Config(model='x', lr=0.5, unrelated=3)
    assert c.kwargs(fn) == {'model': 'x', 'lr': 0.5}


def test_schedule_cross_product():
    s = Schedule(lr=(1e-3, 1e-4), bs=(8, 16))
    assert len(s) == 4
    s2 = Schedule(lr=(1e-3, 1e-4))
    s2.add(momentum=0.9, conditions={'lr': 1e-3})
    confs = list(s2)
    assert any('momentum' in c for c in confs)


def test_conf2optimizer_and_scheduler():
    import optax
    tx = util.conf2optimizer({'Adam': {'lr': 1e-3}})
    assert isinstance(tx, optax.GradientTransformation)
    sched = util.conf2scheduler({'StepLR': {'step_size': 10, 'gamma': 0.5}})
    assert sched(0) == 1. and sched(10) == 0.5


def test_h5_roundtrip(tmp_path):
    fn = str(tmp_path / 'x.h5')
    util.to_h5(fn, contours=np.zeros((3, 8, 2)), scores=np.ones(3),
               attributes={'note': 'test'})
    contours, scores = util.from_h5(fn, 'contours', 'scores')
    assert contours.shape == (3, 8, 2) and scores.sum() == 3


def test_timer():
    with util.Timer('t') as t:
        sum(range(1000))
    assert t.seconds >= 0
