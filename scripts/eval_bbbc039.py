"""BBBC039 instance-segmentation accuracy harness (BASELINE config 4).

Reports F1/Jaccard at IoU thresholds .5–.9 (and their mean, the "mask-AP
style" headline the reference tracks) via LabelMatcher — the metric engine
mirroring ``celldetection/data/instance_eval.py:99-554`` and the evaluation
epoch of ``celldetection/models/lightning_base.py:544-723``.

Usage:
    # real dataset (download needs network; point --data at an existing copy)
    python scripts/eval_bbbc039.py --data /path/to/bbbc039 --model model.cdt
    python scripts/eval_bbbc039.py --data /path/to/bbbc039 --model ginoro.pt
    # train a model first (BASELINE config 4 end-to-end)
    python scripts/eval_bbbc039.py --data /path/to/bbbc039 --train --epochs 50
    # offline self-check of the harness on synthetic data
    python scripts/eval_bbbc039.py --synthetic --train --epochs 4

Prints one JSON line:
    {"metric": "BBBC039 val f1_np@[.5:.9]", "value": ..., "per_iou": {...},
     "best_hparams": {...}, "n_images": N}
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_image(img):
    """Percentile normalization as the reference CLI preprocess
    (``cpn_inference.py:196-222``) applies to non-uint8 inputs."""
    from celldetection_tpu.data.misc import normalize_percentile
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    else:
        img = normalize_percentile(img.astype(np.float32), percentile=99.88)
    if img.ndim == 2:
        img = img[..., None]
    return img


def load_bbbc039(directory, mode='val'):
    from celldetection_tpu.data.datasets.bbbc039 import BBBC039Test, BBBC039Train, BBBC039Val
    ds = {'train': BBBC039Train, 'val': BBBC039Val, 'test': BBBC039Test}[mode](directory)
    return [(normalize_image(img), labels) for _, img, _, labels in ds]


def synthetic_split(n, seed, size=256):
    from celldetection_tpu import data
    out = []
    for i in range(n):
        img, labels = data.random_geometric_objects(size, size, num=24,
                                                    radius=(7, 16), seed=seed + i)
        out.append((img.astype(np.float32)[..., None], labels))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', help='BBBC039 root (images/ masks/ metadata/)')
    ap.add_argument('--synthetic', action='store_true',
                    help='use synthetic toydata (offline harness self-check)')
    ap.add_argument('--model', default='CpnU22',
                    help='.cdt / torch .pt/.ckpt checkpoint, or zoo name for --train')
    ap.add_argument('--train', action='store_true', help='train before evaluating')
    ap.add_argument('--epochs', type=int, default=50)
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--crop', type=int, default=256)
    ap.add_argument('--max-detections', type=int, default=1024)
    ap.add_argument('--in-channels', type=int, default=1)
    ap.add_argument('--score-threshs', type=float, nargs='+',
                    default=[.5, .86, .88, .9, .92],
                    help='validation sweep (parity: lightning_cpn.py:36-39)')
    ap.add_argument('--iou-threshs', type=float, nargs='+', default=[.5, .6, .7, .8, .9])
    args = ap.parse_args()

    from celldetection_tpu import models, util
    from celldetection_tpu.runtime.trainer import CPNTrainer

    if args.synthetic:
        train_data = synthetic_split(24, seed=0)
        val_data = synthetic_split(8, seed=1000)
    elif args.data:
        val_data = load_bbbc039(args.data, 'val')
        train_data = load_bbbc039(args.data, 'train') if args.train else None
    else:
        ap.error('need --data or --synthetic')

    if os.path.isfile(args.model):
        if args.model.endswith(('.pt', '.ckpt', '.pth')):
            model = util.load_torch_cd_model(args.model,
                                             max_detections=args.max_detections)
        else:
            model = util.load_model(args.model)
    else:
        model = models.get_cpn(args.model)(in_channels=args.in_channels,
                                           max_detections=args.max_detections)
        model.init(input_shape=(1, args.crop, args.crop, args.in_channels))
        if not args.train:
            print(f'WARNING: {args.model!r} is a zoo name (no checkpoint file) and '
                  f'--train was not given — evaluating RANDOM weights. Pass a '
                  f'checkpoint path or --train for a meaningful number.',
                  file=sys.stderr)

    trainer = CPNTrainer(model, val_hparams={'score_thresh': args.score_threshs})
    if args.train:
        trainer.fit(train_data, epochs=args.epochs, batch_size=args.batch_size,
                    crop_size=args.crop)

    metrics = trainer.validate(val_data, iou_threshs=tuple(args.iou_threshs))
    record = {
        'metric': 'BBBC039 val f1_np@[.5:.9]' if not args.synthetic
                  else 'synthetic val f1_np@[.5:.9]',
        'value': round(metrics['f1_np'], 4),
        'per_iou': {str(t): round(metrics[f'f1_np_{t}'], 4) for t in args.iou_threshs},
        'jaccard_per_iou': {str(t): round(metrics[f'jaccard_np_{t}'], 4)
                            for t in args.iou_threshs},
        'best_hparams': metrics['best_hparams'],
        'n_images': len(val_data),
    }
    if not args.train and not os.path.isfile(args.model):
        record['untrained'] = True  # random weights — see the stderr warning
    print(json.dumps(record), flush=True)


if __name__ == '__main__':
    main()
