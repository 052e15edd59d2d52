"""Demo: train a CPN on synthetic cells and run tiled inference.

The JAX/TPU equivalent of the reference's demo notebooks
(``demos/Cell Detection with Contour Proposal Networks.ipynb``).

Usage: python scripts/demo.py [--epochs 20] [--out demo_out]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--epochs', type=int, default=20)
    p.add_argument('--out', default='demo_out')
    p.add_argument('--size', type=int, default=128)
    args = p.parse_args()

    import jax
    import celldetection_tpu as cdt
    from celldetection_tpu import data, models

    os.makedirs(args.out, exist_ok=True)
    print(f'devices: {jax.devices()}')

    # 1. Synthetic training data
    train = [data.random_geometric_objects(args.size, args.size, num=8, radius=(6, 14), seed=i)
             for i in range(16)]
    val = [data.random_geometric_objects(args.size, args.size, num=8, radius=(6, 14),
                                         seed=1000 + i) for i in range(4)]

    # 2. Model + trainer
    model = models.CpnU12(in_channels=1, max_detections=128, samples=16,
                          backbone_kwargs=dict(base_channels=16))
    model.init(jax.random.PRNGKey(0), (4, args.size, args.size, 1))
    trainer = cdt.CPNTrainer(model, optimizer={'Adam': {'lr': 2e-3}},
                             val_hparams={'score_thresh': [.5, .8, .9]})
    trainer.fit(train, epochs=args.epochs, batch_size=4, max_instances=16)
    metrics = trainer.validate(val, iou_threshs=(.5, .75))
    print('validation:', {k: round(v, 3) for k, v in metrics.items() if isinstance(v, float)})

    # 3. Tiled inference on a larger mosaic
    mosaic, labels = data.random_geometric_objects(args.size * 3, args.size * 3, num=60,
                                                   radius=(6, 14), seed=9999)
    tiled = cdt.TiledInference(model, tile_size=args.size, stride=args.size * 3 // 4)
    result = tiled(mosaic[..., None])
    print(f'mosaic: {result["num_tiles"]} tiles, {len(result["contours"])} detections')

    # 4. Visualize + save
    from celldetection_tpu import visualization as viz
    ax = viz.show_detection(image=mosaic, contours=list(result['contours']))
    viz.save_fig(os.path.join(args.out, 'detections.png'), ax.figure)
    cdt.save_model(os.path.join(args.out, 'model.cdt'), model)
    print(f'outputs in {args.out}/')


if __name__ == '__main__':
    main()
