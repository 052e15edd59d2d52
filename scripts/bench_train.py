"""Training-step throughput benchmark (VERDICT r4 item 6).

Measures ``CPNTrainer.fit`` on the synthetic workload the trainer docstring
profiles (256^2 tiles, batch 8, CpnU22) and reports:

  - imgs/s end-to-end (host target generation + device step, overlapped)
  - imgs/s device-only (pre-built batch, pure train-step loop)
  - device idle % (how much of the wall clock the chip waits on the host
    pipeline — the overlap efficiency of the prefetching thread pool)

The torch reference trains this workload through Lightning's fit loop
(``celldetection/models/lightning_base.py:277``); there is no committed
reference number for this host, so the figure is absolute (imgs/s/chip).

    python scripts/bench_train.py [--epochs 3] [--size 256] [--batch-size 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--batch-size', type=int, default=8)
    ap.add_argument('--n-train', type=int, default=32)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--samples', type=int, default=32)
    ap.add_argument('--prefetch', type=int, default=1)
    ap.add_argument('--model', default='CpnU22')
    ap.add_argument('--out', default=None, help='also write JSON here')
    args = ap.parse_args()

    import jax
    import optax

    from celldetection_tpu import data, models
    from celldetection_tpu.runtime.trainer import CPNTrainer

    train_data = []
    for i in range(args.n_train):
        img, labels = data.random_geometric_objects(
            args.size, args.size, num=24, radius=(6, 14), seed=i)
        train_data.append((img.astype(np.float32)[..., None], labels))

    model = models.get_cpn(args.model)(in_channels=1, samples=args.samples,
                                       max_detections=512)
    model.init(jax.random.PRNGKey(0), (1, args.size, args.size, 1))
    trainer = CPNTrainer(model, optimizer=optax.adam(5e-4),
                         log_fn=lambda *a: None)

    # warmup: compile the train step + populate host caches
    trainer.fit(train_data, epochs=1, batch_size=args.batch_size,
                crop_size=args.size, prefetch=args.prefetch)

    steps_per_epoch = int(np.ceil(args.n_train / args.batch_size))
    t0 = time.time()
    trainer.fit(train_data, epochs=args.epochs, batch_size=args.batch_size,
                crop_size=args.size, prefetch=args.prefetch)
    # device_get, not block_until_ready: the latter can return early through
    # the axon PJRT relay and under-measure (see .claude/skills/verify)
    jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0].ravel()[0])
    wall = time.time() - t0
    n_imgs = args.epochs * steps_per_epoch * args.batch_size
    e2e = n_imgs / wall

    # device-only: one pre-built batch, pure step loop (no host pipeline)
    batch = trainer._make_batch(train_data, np.arange(args.batch_size),
                                args.samples, model.order, 128,
                                np.random.RandomState(0), crop_size=args.size)
    state = trainer.state
    rng = jax.random.PRNGKey(1)
    state, m = trainer._step_fn(state, batch, rng)  # warm (donation layout)
    jax.device_get(m['loss'])
    n_dev = 20
    t0 = time.time()
    for i in range(n_dev):
        rng, sub = jax.random.split(rng)
        state, m = trainer._step_fn(state, batch, sub)
    jax.device_get(m['loss'])
    dev_wall = time.time() - t0
    dev_imgs = n_dev * args.batch_size / dev_wall

    idle = max(0.0, 1.0 - (n_imgs / dev_imgs) / wall)
    result = {
        'metric': 'train_throughput',
        'model': args.model,
        'size': args.size, 'batch_size': args.batch_size,
        'prefetch': args.prefetch,
        'imgs_per_s_e2e': round(e2e, 2),
        'imgs_per_s_device_only': round(dev_imgs, 2),
        'device_idle_frac': round(idle, 4),
        'steps_per_s_device': round(n_dev / dev_wall, 3),
        'platform': jax.devices()[0].platform,
        'device': str(jax.devices()[0]),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(result, f, indent=1)


if __name__ == '__main__':
    main()
