"""Tests: trainer (fit/validate/calibrate/checkpoint) and the CLI pipeline."""
import os

import jax
import numpy as np
import pytest

import celldetection_tpu as cdt
from celldetection_tpu import data, models
from celldetection_tpu.runtime import CPNTrainer, cpn_inference, preprocess


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    """A briefly-trained tiny model on synthetic cells."""
    model = models.CpnU12(in_channels=1, max_detections=64, samples=12,
                          backbone_kwargs=dict(base_channels=16))
    model.init(jax.random.PRNGKey(0), (2, 96, 96, 1))
    train_data = [data.random_geometric_objects(96, 96, num=5, radius=(6, 12), seed=i)
                  for i in range(8)]
    train_data = [(img, lbl) for img, lbl in train_data]
    trainer = CPNTrainer(model, optimizer={'Adam': {'lr': 2e-3}},
                         val_hparams={'score_thresh': [0.5, 0.8]}, log_fn=lambda *a: None)
    trainer.fit(train_data, epochs=12, batch_size=2, max_instances=16)
    return trainer, train_data


def test_fit_decreases_loss(trained):
    trainer, _ = trained
    losses = [h['loss'] for h in trainer.history]
    assert losses[-1] < losses[0]


def test_validate_sweeps_and_calibrates(trained):
    trainer, train_data = trained
    metrics = trainer.validate(train_data[:2], iou_threshs=(.5,), calibrate=True)
    assert 'f1_np' in metrics
    assert trainer.model.score_thresh in (0.5, 0.8)
    assert metrics['best_hparams'] == trainer.best_hparams


def test_predict_and_tiled_switch(trained):
    trainer, train_data = trained
    img, _ = train_data[0]
    out = trainer.predict(img)[0]
    assert 'contours' in out
    # Large input triggers the tiled path.
    trainer.max_imsize = 64
    trainer.tile_size, trainer.tile_stride = 96, 64
    big = np.tile(img, (2, 2))
    out2 = trainer.predict(big)[0]
    assert 'num_tiles' in out2 and out2['num_tiles'] >= 4


def test_checkpoint_roundtrip(trained, tmp_path):
    trainer, _ = trained
    fn = str(tmp_path / 'ckpt.msgpack')
    trainer.save_checkpoint(fn)
    step = trainer.state.step
    trainer.load_checkpoint(fn)
    assert trainer.state.step == step


def test_preprocess():
    img8 = (np.random.RandomState(0).rand(32, 32) * 255).astype(np.uint8)
    out = preprocess(img8)
    assert out.shape == (32, 32, 3) and out.max() <= 1.
    imgf = np.random.RandomState(0).rand(32, 32) * 1000
    outf = preprocess(imgf, gamma=0.5)
    assert outf.max() <= 1.


def test_cpn_inference_cli_pipeline(trained, tmp_path):
    """Full pipeline: image file -> tiled inference -> h5 + labels + csv outputs."""
    trainer, train_data = trained
    from imageio.v2 import imwrite
    img, _ = train_data[0]
    fn = str(tmp_path / 'input.png')
    imwrite(fn, (np.clip(img, 0, 1) * 255).astype(np.uint8))

    # model expects 1 channel; preprocess makes RGB -> use single-channel model via array input
    results = cpn_inference(
        inputs=[img[..., None].astype(np.float32)], model=trainer.model,
        outputs=str(tmp_path / 'out'), tile_size=96, stride=64,
        labels=True, flat_labels=True, properties=['label', 'area'],
    )
    assert len(results) == 1
    h5s = [f for f in os.listdir(tmp_path / 'out') if f.endswith('.h5')]
    assert len(h5s) == 1
    from celldetection_tpu.util.io import from_h5
    contours = from_h5(str(tmp_path / 'out' / h5s[0]), 'contours')
    assert contours.ndim == 3
    csvs = [f for f in os.listdir(tmp_path / 'out') if f.endswith('.csv')]
    assert len(csvs) == 1


def test_optim_schedules():
    from celldetection_tpu import optim
    w = optim.warmup_schedule(10)
    assert w(0) < w(9) == 1.0
    seq = optim.sequential_schedule([lambda s: 1.0, lambda s: 0.1], [5])
    assert seq(4) == 1.0 and seq(6) == 0.1
    plateau = optim.ReduceLROnPlateau(factor=0.5, patience=1)
    f = [plateau.step(1.0) for _ in range(5)]
    assert f[-1] < 1.0
    assert optim.resolve_rank_factor('sqrt', 4) == 2.0


def test_callbacks():
    from celldetection_tpu.callbacks import KeepAlive, StepDropout
    ka = KeepAlive(timeout=9999, interval=0.01).start()
    ka.ping()
    ka.stop()
    sd = StepDropout([(0, 0.1), (100, 0.0)])
    assert sd(50) == 0.1 and sd(100) == 0.0


def test_cpn_inference_ensemble(trained, tmp_path):
    """Two-model ensemble: voting + final NMS path."""
    trainer, train_data = trained
    img, _ = train_data[0]
    results = cpn_inference(
        inputs=[img[..., None].astype(np.float32)],
        model=[trainer.model, trainer.model],  # same model twice: every box gets 2 votes
        outputs=str(tmp_path / 'ens'), tile_size=96, stride=64, min_vote=2,
    )
    assert len(results) == 1
    single = cpn_inference(
        inputs=[img[..., None].astype(np.float32)], model=trainer.model,
        outputs=str(tmp_path / 'single'), tile_size=96, stride=64,
    )
    # identical duplicated models agree -> ensemble ~= single after NMS
    assert abs(len(results[0]['boxes']) - len(single[0]['boxes'])) <= 1


def test_orbax_checkpoint_roundtrip(trained, tmp_path):
    trainer, _ = trained
    d = str(tmp_path / 'orbax_ckpt')
    step_at_save = trainer.state.step
    trainer.save_checkpoint(d, backend='orbax')
    trainer.state.step = step_at_save + 123
    trainer.load_checkpoint(d, backend='orbax')
    assert trainer.state.step == step_at_save
