"""Training / evaluation / prediction runtime.

Replaces the reference's Lightning modules
(``celldetection/models/lightning_base.py`` — training_step :277,
configure_optimizers :397, evaluation sweep :544-723, calibration :678;
``lightning_cpn.py`` — _evaluation_step :65, forward_tiled :88) with an
explicit JAX trainer:

  - jitted train step (optionally mesh-data-parallel) with EMA loss tracking
  - validation as a **hyperparameter sweep** (e.g. score_thresh values):
    per-setting instance matching (LabelMatcher), reduced over IoU thresholds
    0.5..0.9, followed by **self-calibration** — the best setting (by
    ``f1_np``) is written back onto the model
  - prediction with automatic tiled forward for inputs > ``max_imsize``
  - checkpoint save/resume (params + opt state + RNG + step)
"""
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import optim as optim_lib
from ..data import (LabelMatcher, LabelMatcherList, collate_cpn_targets, cpn_targets_single,
                    contours2labels)
from ..parallel import TiledInference, TrainState, make_train_step
from ..util.config import conf2optimizer

__all__ = ['CPNTrainer']


class CPNTrainer:
    """Explicit training/eval/predict driver for CPN models.

    Args:
        model: Initialized :class:`celldetection_tpu.models.CPN`.
        optimizer: optax transformation or conf dict (``{'Adam': {'lr': ...}}``).
        scheduler: Optional ``step -> lr multiplier`` callable (see
            ``celldetection_tpu.optim``); applied via optax.scale_by_schedule.
        val_hparams: Sweep dict, e.g. ``{'score_thresh': [.5, .86, .88, .9, .92]}``
            (default parity: ``lightning_cpn.py:36-39``).
        mesh: Optional data-parallel device mesh.
        max_imsize: Inputs larger than this use tiled forward (default 2048).
    """

    def __init__(self, model, optimizer=None, scheduler: Optional[Callable] = None,
                 val_hparams: Optional[Dict[str, Sequence]] = None, mesh=None,
                 checkpoint_dir: Optional[str] = None, max_imsize: int = 2048,
                 tile_size: int = 1024, tile_stride: int = 512,
                 ema_decay: float = 0.99, log_fn: Callable = print, seed: int = 0,
                 metrics_logger=None, log_figures_every: int = 0):
        self.model = model
        if optimizer is None:
            optimizer = optax.adam(1e-3)
        elif isinstance(optimizer, dict):
            optimizer = conf2optimizer(optimizer)
        if scheduler is not None:
            # schedules are traced inside the jitted step — they must accept
            # an abstract step count (jnp ops, no int() casts)
            optimizer = optax.chain(optimizer, optax.scale_by_schedule(scheduler))
        self.tx = optimizer
        self.mesh = mesh
        self.val_hparams = val_hparams or {'score_thresh': [.5, .86, .88, .9, .92]}
        self.checkpoint_dir = checkpoint_dir
        self.max_imsize = max_imsize
        self.tile_size = tile_size
        self.tile_stride = tile_stride
        self.ema_decay = ema_decay
        self.log_fn = log_fn
        # metrics + periodic contour-figure logging (parity:
        # lightning_base.py:184-198, 277-286)
        self.metrics_logger = metrics_logger
        self.log_figures_every = log_figures_every
        self.seed = seed
        self.rng = jax.random.PRNGKey(seed)
        self._np_seed_counter = 0
        self.state = TrainState.create(model, self.tx)
        self._step_fn = make_train_step(model, self.tx, mesh=mesh)
        self._tweak_epoch_seen = getattr(model, '_tweak_epoch', 0)
        self._ema_loss = None
        self.history: List[dict] = []
        self.best_hparams: Dict[str, float] = {}

    # --- training -----------------------------------------------------------

    def _make_batch(self, train_data, idx, samples, order, max_instances, rng_np,
                    crop_size=None, item_seeds=None):
        from ..data.misc import random_crop, random_pad
        # Per-item RNG streams (seeded from the batch RNG) keep target
        # sampling identical whether a batch is built whole (single process)
        # or as per-process slices (multi-host fit): item i's crops/samplings
        # depend only on its seed, not on which process renders it.
        if item_seeds is None:
            item_seeds = rng_np.randint(2 ** 31, size=len(idx))
        images, items = [], []
        for i, seed in zip(idx, item_seeds):
            rng_np = np.random.RandomState(int(seed))
            item = train_data[int(i)]
            # (image, labels) or (image, labels, classes) — the 3-tuple is the
            # multiclass form (per-instance class ids, demo-multiclass parity)
            image, labels = item[0], item[1]
            classes = item[2] if len(item) > 2 else None
            if image.ndim == 2:
                image = image[..., None]
            if crop_size is not None:
                # crops keep original label values, so a per-original-id
                # classes array stays aligned (cpn_targets_single resolves
                # classes through a class image painted from these labels)
                image, labels = random_crop(image, labels, height=crop_size, rng=rng_np)
                if image.shape[0] < crop_size or image.shape[1] < crop_size:
                    # smaller-than-crop inputs: pad so the batch stacks
                    image, labels = random_pad(image, labels, height=crop_size,
                                               rng=rng_np)
            items.append(cpn_targets_single(np.ascontiguousarray(labels), samples,
                                            order, rng=rng_np, classes=classes))
            images.append(np.asarray(image, np.float32))
        targets = collate_cpn_targets(items, max_instances=max_instances)
        return {'image': np.stack(images),
                **{k: v for k, v in targets.items() if k != 'num_instances'}}

    def fit(self, train_data, epochs: int = 1, batch_size: int = 4,
            max_instances: int = 128, val_data=None, val_every: int = 1,
            samples: Optional[int] = None, order: Optional[int] = None,
            shuffle: bool = True, adaptive_sampling: bool = False,
            sampling_alpha: float = 1.0, prefetch: int = 1,
            crop_size: int = None):
        """Train on a dataset of ``(image, labels)`` pairs.

        Target generation (cv2 contour extraction, EFD, distance transforms)
        runs in a host thread pool ``prefetch`` batches ahead of the device
        step — cv2/numpy release the GIL, so target encoding overlaps device
        compute (replaces the reference's DataLoader worker processes).
        Measured on TPU v5e at 256^2/batch 8: depth 1 (one batch ahead) is
        optimal (36 imgs/s); deeper prefetch oversubscribes host threads.

        ``adaptive_sampling`` re-weights item sampling by per-item EMA loss at
        each epoch end (parity: ``lightning_base.py:322-371``'s item records +
        ``update_sampler_weights``).
        """
        from concurrent.futures import ThreadPoolExecutor
        # conf2tweaks_ applied after trainer construction: rebuild the jitted
        # step so the new norm overrides are traced in (ADVICE r4)
        if getattr(self.model, '_tweak_epoch', 0) != self._tweak_epoch_seen:
            self._step_fn = make_train_step(self.model, self.tx, mesh=self.mesh)
            self._tiled = None
            self._tweak_epoch_seen = getattr(self.model, '_tweak_epoch', 0)
        samples = samples or self.model.samples
        order = order or self.model.order
        n = len(train_data)
        order_idx = np.arange(n)
        # host-side pipeline RNG derives from the trainer seed; the counter
        # keeps repeated fit() calls from replaying identical shuffles
        rng_np = np.random.RandomState((self.seed + 977 * self._np_seed_counter)
                                       % (2 ** 31))
        self._np_seed_counter += 1
        item_loss = np.zeros(n)
        item_seen = np.zeros(n, bool)
        prefetch = max(prefetch, 1)
        pool = ThreadPoolExecutor(max_workers=prefetch)
        # Multi-host fit (mesh spans processes): every process walks the SAME
        # global epoch order (identical seed), builds only its 1/n_proc slice
        # of each batch, and the train step assembles the slices into one
        # global sharded batch — the DistributedSampler role in the
        # reference's multi-node DDP training (lightning_base.py:397-440).
        from ..parallel.train import mesh_spans_processes
        n_proc, rank = 1, 0
        if self.mesh is not None and 'data' in self.mesh.shape:
            data_size = self.mesh.shape['data']
            if batch_size % data_size:
                raise ValueError(f'batch_size ({batch_size}) must be divisible '
                                 f'by the mesh data-axis size ({data_size})')
        if mesh_spans_processes(self.mesh):
            n_proc, rank = jax.process_count(), jax.process_index()
            if batch_size % n_proc:
                raise ValueError(f'multi-host fit: batch_size ({batch_size}) must '
                                 f'be divisible by the process count ({n_proc})')
        local_bs = batch_size // n_proc
        for epoch in range(epochs):
            self.item_record = {}  # per-epoch item records (lightning_base.py:311)
            if adaptive_sampling and item_seen.all():
                w = np.power(np.maximum(item_loss, 1e-8), sampling_alpha)
                w = w / w.sum()
                order_idx = rng_np.choice(n, size=n, replace=True, p=w)
            elif shuffle:
                order_idx = np.arange(n)
                rng_np.shuffle(order_idx)
            t0 = time.time()
            # Trailing partial batch: wrap-pad with the epoch's leading items
            # (static batch shape on TPU; the reference's DataLoader keeps the
            # partial batch, drop-last would silently skip items).
            if n % batch_size:
                pad = batch_size - n % batch_size
                epoch_idx = np.concatenate([order_idx, order_idx[:pad]])
            else:
                epoch_idx = order_idx
            starts = list(range(0, len(epoch_idx), batch_size))
            batch_rngs = [np.random.RandomState(rng_np.randint(2 ** 31)) for _ in starts]

            def submit(j):
                gidx = epoch_idx[starts[j]:starts[j] + batch_size]
                seeds = batch_rngs[j].randint(2 ** 31, size=len(gidx))
                lo, hi = rank * local_bs, (rank + 1) * local_bs
                return pool.submit(self._make_batch, train_data, gidx[lo:hi],
                                   samples, order, max_instances, batch_rngs[j],
                                   crop_size, seeds[lo:hi])

            window = {j: submit(j) for j in range(min(prefetch, len(starts)))}
            for bi, start in enumerate(starts):
                idx = epoch_idx[start:start + batch_size][rank * local_bs:
                                                          (rank + 1) * local_bs]
                batch = window.pop(bi).result()
                nxt = bi + prefetch
                if nxt < len(starts):
                    window[nxt] = submit(nxt)
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self._step_fn(self.state, batch, sub)
                loss = float(metrics['loss'])
                self._ema_loss = loss if self._ema_loss is None else \
                    self.ema_decay * self._ema_loss + (1 - self.ema_decay) * loss
                # per-item record: batch loss attributed to its items (exact
                # parity with training_item_record, lightning_base.py:258-275)
                for i in idx:
                    self.item_record.setdefault(int(i), []).append(
                        {'batch_loss': loss})
                if self.metrics_logger is not None:
                    self.metrics_logger.log(self.state.step, loss=loss,
                                            ema_loss=self._ema_loss,
                                            **{k: float(v) for k, v in metrics.items()
                                               if k != 'loss'})
                if self.log_figures_every and self.state.step % self.log_figures_every == 0:
                    self._log_contour_figure(batch['image'][:1])
            # Epoch-end: merge item records (cross-process when multi-host)
            # into the adaptive-sampling loss table (lightning_base.py:322-371).
            for i, recs in self.gather_item_records().items():
                if i >= n:
                    continue
                mean_loss = float(np.mean([r['batch_loss'] for r in recs]))
                item_loss[i] = mean_loss if not item_seen[i] else \
                    0.5 * item_loss[i] + 0.5 * mean_loss
                item_seen[i] = True
            self.log_fn(f'epoch {epoch}: loss={loss:.4f} ema={self._ema_loss:.4f} '
                        f'({time.time() - t0:.1f}s)')
            self.history.append({'epoch': epoch, 'loss': loss, 'ema_loss': self._ema_loss})
            if val_data is not None and (epoch + 1) % val_every == 0:
                self.validate(val_data)
            if self.checkpoint_dir:
                self.save_checkpoint(os.path.join(self.checkpoint_dir, 'last.ckpt'))
        pool.shutdown(wait=False)
        self.model.variables = self.state.variables()
        return self.history

    def gather_item_records(self) -> Dict[int, list]:
        """Merge per-item training records across processes.

        Parity: ``gather_item_records`` (``lightning_base.py:322-336``), which
        uses ``all_gather_object``. Here the ragged records serialize to
        padded (index, loss) arrays exchanged via ``process_allgather``.
        """
        record = getattr(self, 'item_record', {})
        if jax.process_count() <= 1:
            return record
        from jax.experimental import multihost_utils
        keys = np.array([k for k, v in record.items() for _ in v], np.int32)
        vals = np.array([r['batch_loss'] for v in record.values() for r in v],
                        np.float32)
        n_all = multihost_utils.process_allgather(np.array([len(keys)], np.int32))
        m = int(np.max(n_all))
        keys_all = multihost_utils.process_allgather(
            np.pad(keys, (0, m - len(keys)), constant_values=-1))
        vals_all = multihost_utils.process_allgather(np.pad(vals, (0, m - len(vals))))
        merged: Dict[int, list] = {}
        for k, v in zip(np.asarray(keys_all).reshape(-1), np.asarray(vals_all).reshape(-1)):
            if k >= 0:
                merged.setdefault(int(k), []).append({'batch_loss': float(v)})
        return merged

    # --- validation sweep + calibration ------------------------------------

    def validate(self, val_data, iou_threshs: Sequence[float] = (.5, .6, .7, .8, .9),
                 calibrate: bool = True, reduce_fn=None,
                 fast_labels: bool = False, distributed: bool = False) -> Dict[str, float]:
        """Hyperparameter-sweep validation with self-calibration.

        For every combination of ``val_hparams`` values, runs inference on all
        validation items, matches instances (LabelMatcher), reduces metrics
        over ``iou_threshs`` and, if ``calibrate``, sets the model attributes
        to the best setting by ``f1_np``.

        ``distributed=True`` rank-deduplicates the validation set across
        processes and sums the metric counts globally (parity:
        ``lightning_base.py:629-633`` + the all_reduce of LabelMatcherList).
        """
        from itertools import product as iproduct
        if distributed:
            from ..parallel import host_all_reduce_sum, shard_inputs_by_process
            val_data = shard_inputs_by_process(list(val_data), 'rank')
            reduce_fn = reduce_fn or host_all_reduce_sum
        self.model.variables = self.state.variables()
        keys = list(self.val_hparams.keys())
        combos = list(iproduct(*self.val_hparams.values()))
        results = {}
        for combo in combos:
            setting = dict(zip(keys, combo))
            # apply non-score hparams once per combo (one recompile per
            # distinct setting); score_thresh is a runtime argument
            combo_saved = self._apply_model_hparams(
                {k: v for k, v in setting.items() if k != 'score_thresh'})
            matchers = LabelMatcherList(reduce_fn=reduce_fn)
            for item in val_data:
                # (image, labels) or (image, labels, classes) — the multiclass
                # triple form accepted by fit(); instance matching ignores the
                # class ids (parity: _evaluation_step, lightning_cpn.py:65-78)
                image, labels = item[0], item[1]
                if image.ndim == 2:
                    image = image[..., None]
                pred = self._predict_single(np.asarray(image, np.float32),
                                            score_thresh=setting.get('score_thresh'))
                h, w = image.shape[:2]
                if fast_labels:
                    # native scanline fill (last-wins overlaps)
                    from ..native import contours2labels_native
                    pred_labels = contours2labels_native(list(pred['contours']), (h, w))
                else:
                    # reference-exact: channelled render, overlaps preserved
                    # for the matcher (lightning_cpn.py:65-78)
                    pred_labels = contours2labels(list(pred['contours']), (h, w))
                # pass channelled targets as-is: the matcher handles channels
                # and collapsing with max() would erase overlapping instances
                matchers.append(LabelMatcher(pred_labels, labels))
            metrics = {}
            for it in iou_threshs:
                matchers.iou_thresh = it
                metrics[f'f1_np_{it}'] = matchers.f1_np
                metrics[f'avg_f1_{it}'] = matchers.avg_f1
                metrics[f'jaccard_np_{it}'] = matchers.jaccard_np
            metrics['f1_np'] = float(np.mean([metrics[f'f1_np_{t}'] for t in iou_threshs]))
            metrics['avg_f1'] = float(np.mean([metrics[f'avg_f1_{t}'] for t in iou_threshs]))
            results[combo] = metrics
            self.log_fn(f'val {setting}: f1_np={metrics["f1_np"]:.4f}')
            self._apply_model_hparams(combo_saved)
        best_combo = max(results, key=lambda c: results[c]['f1_np'])
        # plain python floats: best_hparams lands in msgpack checkpoints
        self.best_hparams = {k: (float(v) if isinstance(v, (np.floating, np.integer))
                                 else v) for k, v in zip(keys, best_combo)}
        if calibrate:
            for k, v in self.best_hparams.items():
                setattr(self.model, k, v)
                self.model._jit_cache.clear()
            self.log_fn(f'calibrated: {self.best_hparams} '
                        f'(f1_np={results[best_combo]["f1_np"]:.4f})')
        out = dict(results[best_combo])
        out['best_hparams'] = self.best_hparams
        return out

    # --- prediction ---------------------------------------------------------

    def _apply_model_hparams(self, hparams: dict) -> dict:
        """Set model attributes (nms_thresh, certainty_thresh, ...) that are
        baked into the jitted programs; returns the previous values. Caches
        are cleared only when a value actually changes, so sweeping pays one
        recompile per distinct setting, not per image."""
        saved, changed = {}, False
        for k, v in hparams.items():
            if not hasattr(self.model, k):
                raise AttributeError(f'Unknown model hparam for prediction: {k!r}')
            cur = getattr(self.model, k)
            saved[k] = cur
            if cur != v:
                setattr(self.model, k, v)
                changed = True
        if changed:
            self.model._jit_cache.clear()
            self._tiled = None
        return saved

    def _predict_single(self, image: np.ndarray, **hparams) -> dict:
        h, w = image.shape[:2]
        score_thresh = hparams.pop('score_thresh', None)
        saved = self._apply_model_hparams(hparams) if hparams else {}
        try:
            if max(h, w) > self.max_imsize:
                if getattr(self, '_tiled', None) is None:
                    # cache: per-instance jits recompile on every call otherwise
                    self._tiled = TiledInference(self.model, tile_size=self.tile_size,
                                                 stride=self.tile_stride, mesh=self.mesh)
                return self._tiled(image, score_thresh=score_thresh)
            out = self.model(image, score_thresh=score_thresh)
            return {k: (v[0] if isinstance(v, list) else v) for k, v in out.items()}
        finally:
            if saved:
                self._apply_model_hparams(saved)

    def predict(self, images) -> List[dict]:
        """Predict on one or more images (auto-tiled when large)."""
        self.model.variables = self.state.variables()
        if isinstance(images, np.ndarray) and images.ndim <= 3:
            images = [images]
        return [self._predict_single(np.asarray(im, np.float32)) for im in images]

    def _log_contour_figure(self, image: np.ndarray):
        """Render current predictions on a training image (host-side, saved
        through the metrics logger directory)."""
        try:
            from ..visualization.images import show_detection, save_fig
            self.model.variables = self.state.variables()
            out = self.model(image)
            ax = show_detection(image=np.asarray(image[0, ..., 0]),
                                contours=list(out['contours'][0]))
            log_dir = os.path.dirname(getattr(self.metrics_logger, 'path', 'logs/x')) or 'logs'
            os.makedirs(log_dir, exist_ok=True)
            save_fig(os.path.join(log_dir, f'contours_step{self.state.step}.png'), ax.figure)
        except Exception as e:  # figure logging must never kill training
            self.log_fn(f'figure logging failed: {type(e).__name__}: {e}')

    # --- checkpointing ------------------------------------------------------

    def save_checkpoint(self, path: str, backend: str = 'msgpack'):
        """Save params/model-state/opt-state/step/RNG.

        ``backend='orbax'`` writes an Orbax checkpoint directory (sharded,
        multi-host-safe — the production choice for pods); the default single
        msgpack file is convenient for single-host runs.
        """
        if backend == 'orbax':
            import orbax.checkpoint as ocp
            ckpt = {
                'variables': self.state.variables(),
                'opt_state': self.state.opt_state,
                'step': self.state.step,
                'rng': np.asarray(jax.random.key_data(self.rng)),
            }
            with ocp.PyTreeCheckpointer() as cp:
                cp.save(os.path.abspath(path), ckpt, force=True)
            return
        import msgpack
        from flax import serialization
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        payload = {
            'variables': serialization.to_bytes(self.state.variables()),
            'opt_state': serialization.to_bytes(self.state.opt_state),
            'step': self.state.step,
            'rng': np.asarray(jax.random.key_data(self.rng)).tolist(),
            'best_hparams': self.best_hparams,
        }
        with open(path, 'wb') as f:
            f.write(msgpack.packb(payload))

    def load_checkpoint(self, path: str, backend: str = 'msgpack'):
        if backend == 'orbax':
            import orbax.checkpoint as ocp
            template = {
                'variables': self.state.variables(),
                'opt_state': self.state.opt_state,
                'step': self.state.step,
                'rng': np.asarray(jax.random.key_data(self.rng)),
            }
            with ocp.PyTreeCheckpointer() as cp:
                ckpt = cp.restore(os.path.abspath(path), item=template)
            self.state.params = ckpt['variables']['params']
            self.state.model_state = {k: v for k, v in ckpt['variables'].items()
                                      if k != 'params'}
            self.state.opt_state = ckpt['opt_state']
            self.state.step = int(ckpt['step'])
            self.rng = jax.random.wrap_key_data(jnp.asarray(ckpt['rng'], jnp.uint32))
            self.model.variables = self.state.variables()
            return
        import msgpack
        from flax import serialization
        with open(path, 'rb') as f:
            payload = msgpack.unpackb(f.read(), strict_map_key=False)
        variables = serialization.from_bytes(self.state.variables(), payload['variables'])
        self.state.params = variables['params']
        self.state.model_state = {k: v for k, v in variables.items() if k != 'params'}
        self.state.opt_state = serialization.from_bytes(self.state.opt_state,
                                                        payload['opt_state'])
        self.state.step = payload['step']
        self.rng = jax.random.wrap_key_data(jnp.asarray(payload['rng'], jnp.uint32))
        self.best_hparams = payload.get('best_hparams', {})
        self.model.variables = self.state.variables()
