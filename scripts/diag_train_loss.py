"""Diagnose the trained-accuracy gap: lockstep loss comparison, ref vs rebuild.

Round-3 head-to-head found our *trained* f1@IoU.9 well below the reference's
(0.19 vs 0.48) while reference-trained weights through OUR forward reproduce
the reference's curve (0.894) — so inference/transport are parity and the
defect is on the training side. This script isolates it:

  stage A: identical weights + identical targets -> per-component loss diff
  stage B: N lockstep Adam steps on one repeated batch -> loss trajectories
  stage C: our target generator vs the reference's on the same labels

Run on CPU (JAX_PLATFORMS=cpu python scripts/diag_train_loss.py).
"""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, 'tests'))
sys.path.insert(0, os.path.join(ROOT, 'scripts'))

SIZE, ORDER, SAMPLES = 128, 5, 32


def build_pair():
    """Reference CpnU22 and our CpnU22 with identical (transported) weights."""
    import refshim
    refshim.install()
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import celldetection as cd
    import torch
    from celldetection_tpu import models, util

    # zero dropout on both sides so the comparison is deterministic
    import functools
    from celldetection_tpu.models import cpn as cpn_mod
    if not isinstance(cpn_mod.ReadOut, functools.partial):
        cpn_mod.ReadOut = functools.partial(cpn_mod.ReadOut, dropout=0.0)

    torch.manual_seed(0)
    ref = cd.models.CpnU22(in_channels=1, order=ORDER, samples=SAMPLES)
    ours = models.CpnU22(in_channels=1, order=ORDER, samples=SAMPLES,
                         max_detections=1024)
    ours.init(input_shape=(1, SIZE, SIZE, 1))
    sd = {k[len('core.'):]: v.numpy() for k, v in ref.state_dict().items()
          if k != 'order_weights'}
    ours.variables = util.import_state_dict(
        ours.variables, util.translate_cpn_state_dict(sd), strict=True)

    # zero dropout on both sides so the comparison is deterministic
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout2d) or isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return cd, torch, ref, ours


def make_batch(cd, n=4):
    from head_to_head import synthetic_split, ref_targets
    data = synthetic_split(n, seed=0, size=SIZE)
    rng = np.random.RandomState(1)
    items = []
    for img, labels in data:
        d = ref_targets(cd, labels, rng)
        d['inputs'] = img.astype('float32')
        items.append(d)
    return cd.universal_dict_collate_fn(items), data


def to_our_targets(batch, torch):
    """Reference collated targets -> our padded [B, max_inst, ...] layout."""
    def tonp(t):
        return np.asarray(t.detach().cpu()) if torch.is_tensor(t) else np.asarray(t)

    labels = tonp(batch['labels'])           # [B, H, W] int
    if labels.ndim == 4:
        labels = labels[..., 0] if labels.shape[-1] == 1 else labels
    four = [tonp(f) for f in batch['fourier']]
    locs = [tonp(f) for f in batch['locations']]
    scon = [tonp(f) for f in batch['sampled_contours']]
    hires = [tonp(f) for f in batch['hires_sampled_contours']]
    samp = [tonp(f) for f in batch['sampling']]
    b = len(four)
    max_inst = max(f.shape[0] for f in four) or 1

    def pad(arrs, trailing):
        out = np.zeros((b, max_inst) + trailing, np.float32)
        for i, a in enumerate(arrs):
            out[i, :a.shape[0]] = a
        return out

    return {
        'labels': labels.astype(np.int32),
        'fourier': pad(four, (ORDER, 4)),
        'locations': pad(locs, (2,)),
        'sampled_contours': pad(scon, (SAMPLES, 2)),
        'hires_sampled_contours': pad(hires, (SAMPLES, 2)),
        'sampling': np.stack([s.ravel()[:SAMPLES] for s in samp]).astype(np.float32),
    }


def ref_losses(cd, torch, ref, batch):
    ref.train()
    out = ref(batch['inputs'], targets=batch)
    comps = {k: (float(v.detach()) if v is not None else None)
             for k, v in out['losses'].items()}
    return float(out['loss'].detach()), comps, out


def our_losses(ours, image_nhwc, targets, rng):
    import jax
    out, _ = ours.forward_padded(ours.variables, image_nhwc, train=True,
                                 targets=targets, selection_rng=rng, mutable=True)
    comps = {k: (float(v) if v is not None else None)
             for k, v in out['losses'].items()}
    return float(out['loss']), comps, out


def main():
    import jax
    cd, torch, ref, ours = build_pair()
    batch, data = make_batch(cd)
    image_nhwc = np.stack([img for img, _ in data])  # [B,H,W,1] float
    targets = to_our_targets(batch, torch)

    print('=== stage A: identical weights + identical targets ===')
    rl, rc, _ = ref_losses(cd, torch, ref, batch)
    ol, oc, _ = our_losses(ours, image_nhwc, targets, jax.random.PRNGKey(0))
    print(f'{"component":<14}{"ref":>12}{"ours":>12}{"diff":>12}')
    keys = sorted(set(rc) | set(oc))
    for k in keys:
        r, o = rc.get(k), oc.get(k)
        if r is None and o is None:
            continue
        rs = f'{r:.5f}' if r is not None else '-'
        os_ = f'{o:.5f}' if o is not None else '-'
        d = f'{(o or 0) - (r or 0):+.5f}'
        print(f'{k:<14}{rs:>12}{os_:>12}{d:>12}')
    print(f'{"TOTAL":<14}{rl:>12.5f}{ol:>12.5f}{ol - rl:>+12.5f}')

    print('=== stage B: lockstep Adam(8e-4), same batch, 25 steps ===')
    import optax
    from celldetection_tpu.parallel import TrainState, make_train_step
    tx = optax.adam(8e-4)
    state = TrainState.create(ours, tx)
    step_fn = make_train_step(ours, tx)
    opt = torch.optim.Adam(ref.parameters(), lr=8e-4)
    our_batch = {'image': image_nhwc, **targets}
    for i in range(25):
        opt.zero_grad()
        out = ref(batch['inputs'], targets=batch)
        out['loss'].backward()
        opt.step()
        state, metrics = step_fn(state, our_batch, jax.random.PRNGKey(i))
        if i % 4 == 0 or i == 24:
            print(f'step {i:3d}  ref={float(out["loss"].detach()):9.4f}  '
                  f'ours={float(metrics["loss"]):9.4f}')

    print('=== stage C: target generator comparison (same labels, stats) ===')
    from celldetection_tpu.data.targets import cpn_targets_single
    rng = np.random.RandomState(7)
    for i, (img, labels) in enumerate(data[:2]):
        np.random.seed(123 + i)
        gen = cd.data.CPNTargetGenerator(samples=SAMPLES, order=ORDER)
        gen.feed(labels=np.ascontiguousarray(labels))
        ours_t = cpn_targets_single(np.ascontiguousarray(labels), SAMPLES, ORDER,
                                    rng=np.random.RandomState(123 + i))
        ref_f, our_f = np.asarray(gen.fourier), np.asarray(ours_t['fourier'])
        n = min(len(ref_f), len(our_f))
        print(f'item {i}: inst ref={len(ref_f)} ours={len(our_f)} '
              f'|fourier diff|={np.abs(ref_f[:n] - our_f[:n]).mean():.5f} '
              f'|loc diff|={np.abs(np.asarray(gen.locations)[:n] - np.asarray(ours_t["locations"])[:n]).mean():.5f}')
        rr = np.asarray(gen.resampled_contours)
        orr = np.asarray(ours_t['hires_sampled_contours'])
        print(f'         |hires diff|={np.abs(rr[:n] - orr[:n]).mean():.5f} '
              f'labels equal={np.array_equal(np.asarray(gen.reduced_labels), np.asarray(ours_t["labels"]))}')


if __name__ == '__main__':
    main()
