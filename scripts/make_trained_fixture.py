"""Produce the committed trained-weights fixture for the bf16 parity tests.

``tests/test_bf16_parity.py`` gates bf16-vs-fp32 accuracy with *trained*
weights. Training in-test (60 epochs each run) made the gate a platform
lottery and dominated suite runtime; instead this script trains the fixture
once and commits the weights (VERDICT r4 weak-item 1). Regenerate with::

    python scripts/make_trained_fixture.py

The config mirrors the test exactly; the synthetic dataset is seeded, so the
fixture is reproducible up to platform reduction order.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE, N_TRAIN = 64, 12
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tests', 'fixtures', 'cpnu12_trained.cdt')

MODEL_KW = dict(in_channels=1, order=3, samples=24, max_detections=128,
                backbone_kwargs=dict(base_channels=16))


def split(n, seed):
    from celldetection_tpu import data
    out = []
    for i in range(n):
        img, labels = data.random_geometric_objects(
            SIZE, SIZE, num=6, radius=(6, 11), seed=seed + i)
        out.append((img.astype(np.float32)[..., None], labels))
    return out


def main():
    import optax

    from celldetection_tpu import models, util
    from celldetection_tpu.runtime.trainer import CPNTrainer

    model = models.CpnU12(**MODEL_KW)
    model.init(input_shape=(1, SIZE, SIZE, 1))
    trainer = CPNTrainer(model, optimizer=optax.adam(2e-3), log_fn=lambda *a: None)
    trainer.fit(split(N_TRAIN, 0), epochs=60, batch_size=4, crop_size=SIZE)
    model.variables = trainer.state.variables()
    util.save_model(OUT, model, meta={'purpose': 'bf16-parity test fixture',
                                      'train': '60 epochs synthetic, seed 0'})
    print('saved', OUT, os.path.getsize(OUT), 'bytes')


if __name__ == '__main__':
    main()
