"""Batch tiled-inference pipeline + CLI (``cdt-inference-cpn``).

Behavioral reference: ``celldetection_scripts/cpn_inference.py`` (1035 LoC) —
``preprocess`` (:196), ``resolve_model`` (:225), ``apply_model`` (:311),
``cpn_inference`` (:432), ``main`` (:872). Flag names mirror the reference
CLI so existing invocations port directly.

TPU-native pipeline: inputs are process-sharded (replacing MPI
``group_level``), each mosaic runs through the mesh-sharded
:class:`TiledInference` (replacing Lightning's rank-split tile predict +
``oom_safe_gather_dict``), and per-input outputs (h5 contours/scores/boxes/
classes, label images, region-property CSVs, overlays) are written by process
0 of each input.
"""
import argparse
import glob as glob_mod
import json
import os
from typing import List, Optional, Sequence, Union

import numpy as np

__all__ = ['cpn_inference', 'preprocess', 'resolve_model', 'main']


def preprocess(img: np.ndarray, percentile: Optional[float] = None, gamma: float = 1.,
               contrast: float = 1., brightness: float = 0., to_rgb: bool = True) -> np.ndarray:
    """Normalize an input mosaic (parity: ``cpn_inference.py:196-222``).

    uint8 inputs scale by 255; other dtypes percentile-normalize (implicit
    99.9 when unset). Optional gamma/contrast/brightness, gray→RGB.
    """
    from ..data.misc import normalize_percentile
    if img.dtype == np.uint8 and percentile is None:
        img = img.astype(np.float32) / 255.
    else:
        img = normalize_percentile(img, percentile if percentile is not None else 99.9)
    if gamma != 1.:
        img = np.clip(img, 0, 1) ** gamma
    if contrast != 1. or brightness != 0.:
        img = np.clip(img * contrast + brightness, 0., 1.)
    if to_rgb:
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, -1)
    return img.astype(np.float32)


def resolve_model(model: Union[str, object], model_parameters: Optional[str] = None,
                  input_shape=None, **kwargs):
    """Model spec → initialized CPN (parity: ``cpn_inference.py:225-254``).

    Accepts a CPN instance, a cdt/.pt checkpoint path, or a hosted name.
    ``model_parameters``: comma-separated ``key=value`` attribute overrides,
    typed by the existing attribute (e.g. ``"score_thresh=0.86,samples=128"``).
    """
    from ..util.serialization import fetch_model, load_model
    if isinstance(model, str):
        if os.path.isfile(model):
            model = load_model(model, input_shape=input_shape, **kwargs)
        else:
            model = fetch_model(model, input_shape=input_shape, **kwargs)
    if model_parameters:
        for spec in model_parameters.split(','):
            k, v = spec.split('=')
            k = k.strip()
            if hasattr(model, k):
                cur = getattr(model, k)
                typ = type(cur) if cur is not None else float
                setattr(model, k, typ(v) if typ is not bool else v.lower() in ('1', 'true'))
                model._jit_cache.clear()
    return model


def _ensemble(tiled_list, img, mask, pmask, min_vote: int, nms_thresh: float,
              reps: int = 1, point_mask_exclusive: bool = False) -> dict:
    """Multi-model ensemble: concat per-model detections, box voting, final NMS."""
    import jax
    import jax.numpy as jnp
    from ..ops.boxes import filter_by_box_voting, nms_padded
    from ..parallel.tiles import tta_inference

    if reps > 1:
        results = [tta_inference(t, img, reps=reps, mask=mask, point_mask=pmask,
                                 point_mask_exclusive=point_mask_exclusive)
                   for t in tiled_list]
    else:
        results = [t(img, mask=mask, point_mask=pmask,
                     point_mask_exclusive=point_mask_exclusive) for t in tiled_list]
    keys = ('contours', 'boxes', 'scores', 'classes', 'locations', 'fourier')
    cat = {k: np.concatenate([r[k] for r in results]) for k in keys
           if results[0].get(k) is not None}
    n = len(cat['boxes'])
    if n == 0:
        out = dict(results[0])
        return out
    boxes = jnp.asarray(cat['boxes'])
    scores = jnp.asarray(cat['scores'])
    valid = jnp.ones((n,), bool)
    if min_vote > 1:
        valid = filter_by_box_voting(boxes, nms_thresh, min_vote, valid)
    keep = nms_padded(boxes, scores, valid, nms_thresh)
    keep = np.asarray(keep)
    out = {k: v[keep] for k, v in cat.items()}
    out['num_tiles'] = sum(r.get('num_tiles', 0) for r in results)
    return out


def _load_inputs(inputs: Union[str, Sequence[str]]) -> List[str]:
    if isinstance(inputs, str):
        inputs = [inputs]
    files = []
    for i in inputs:
        if any(c in i for c in '*?['):
            files += sorted(glob_mod.glob(i))
        else:
            files.append(i)
    return files


def cpn_inference(
        inputs, model, outputs: str = 'outputs', masks=None, point_masks=None,
        tile_size: int = 1024, stride: int = 768,
        batch_size: Optional[int] = None, precision: str = '32', border_removal: int = 4,
        stitching_rule: str = 'nms', min_vote: int = 1, score_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None, percentile: Optional[float] = None,
        gamma: float = 1., contrast: float = 1., brightness: float = 0.,
        group_level: str = 'rank', model_parameters: Optional[str] = None,
        labels: bool = False, flat_labels: bool = False, properties: Optional[List[str]] = None,
        overlay: bool = False, overlay_processes: int = None,
        demo_figure: bool = False, continue_on_exception: bool = False,
        reps: int = 1,
        accelerator: Optional[str] = None, devices=None, num_nodes: int = 1,
        grayscale: bool = False, inputs_method: str = 'imageio', separator: str = '-',
        inputs_dataset: str = 'image', masks_dataset: str = 'mask',
        point_masks_dataset: str = 'point_mask', point_mask_exclusive: bool = False,
        skip_existing: bool = False, truncated_images: bool = False,
        model_kwargs: Optional[str] = None, spacing=None,
):
    """Run tiled CPN inference on large input images.

    Args (mirroring the reference CLI):
        inputs: Filename(s), glob pattern(s), or arrays.
        model: Model name/path/instance (see :func:`resolve_model`).
        outputs: Output directory (h5 per input + optional artifacts).
        tile_size / stride: Sliding-window geometry (defaults 1024/768).
        precision: '32' or 'bf16' (backbone compute dtype).
        border_removal: Interior tile-border margin in px.
        stitching_rule: 'nms' and/or 'ex_br' (comma-separated).
        score_thresh / nms_thresh: Optional model overrides.
        group_level: 'job' (all processes on all inputs) or 'rank'
            (round-robin input sharding across processes).
        labels / flat_labels: Also write (channelled / flattened) label images.
        properties: Region properties to export as CSV.
        overlay: Write an RGBA overlay image.
        reps: Test-time augmentation repetitions over flips (1-4; parity:
            TileLoader ``reps``, ``cpn_inference.py:112-118``).
        accelerator: 'tpu'/'auto'/None accepted (TPU-native build); anything
            else raises — there is no CPU/GPU backend here.
        devices: Optionally cap the number of local devices in the mesh.
        num_nodes: Expected process count (validated against the runtime).
        separator: Column separator for multi-valued region properties in the
            CSV export (ref default '-'; e.g. ``bbox-0``..``bbox-3``).
        inputs_dataset / masks_dataset / point_masks_dataset: Default h5 keys
            for ``.h5`` inputs given without an explicit ``::key``.
        spacing: Physical pixel spacing (scalar or per-axis) for property
            export in physical units.
        point_mask_exclusive: Point mask becomes the score *upper* bound too
            (detect only at marked points).

    Returns:
        List of per-input result dicts.
    """
    import jax.numpy as jnp
    from ..data.cpn import contours2labels, resolve_label_channels, contours2overlay
    from ..parallel import make_mesh, shard_inputs_by_process
    from ..parallel.tiles import TiledInference
    from ..util.io import load_image, to_h5

    os.makedirs(outputs, exist_ok=True)

    if truncated_images:
        try:
            from PIL import ImageFile
            ImageFile.LOAD_TRUNCATED_IMAGES = True
        except ImportError:
            pass

    # Resolve model(s) (+ optional precision/overrides). Multiple models form
    # an ensemble: per-model tiled inference, box voting >= min_vote, final
    # NMS (parity: cpn_inference.py:419-427).
    mk = json.loads(model_kwargs) if model_kwargs else {}
    model_list = model if isinstance(model, (list, tuple)) else [model]
    model_list = [resolve_model(m, model_parameters, **mk) for m in model_list]
    for m in model_list:
        if precision in ('bf16', 'bfloat16', '16'):
            m.compute_dtype = jnp.bfloat16
            m._jit_cache.clear()
        if score_thresh is not None:
            m.score_thresh = score_thresh
        if nms_thresh is not None:
            m.nms_thresh = nms_thresh
            m._jit_cache.clear()
    model = model_list[0]

    if accelerator not in (None, 'auto', 'tpu'):
        raise ValueError(f"accelerator={accelerator!r}: this build runs on TPU "
                         f"(or the CPU platform JAX exposes); use 'tpu'/'auto'")
    import jax
    if num_nodes not in (1, jax.process_count()):
        raise ValueError(f'num_nodes={num_nodes} but jax.process_count()='
                         f'{jax.process_count()} — start one process per node '
                         f'(jax.distributed.initialize)')
    try:
        local = jax.local_devices()
        if devices:
            local = local[:int(devices)]
        mesh = make_mesh((len(local),), ('data',), devices=local)
    except Exception:
        mesh = None
    tiled_list = [TiledInference(m, tile_size=tile_size, stride=stride,
                                 batch_size=batch_size, border_removal=border_removal,
                                 stitching_rule=stitching_rule, mesh=mesh)
                  for m in model_list]
    tiled = tiled_list[0]

    # Input resolution + process-level sharding (replaces MPI group_level).
    if isinstance(inputs, np.ndarray):
        file_list = [inputs]
    elif isinstance(inputs, (list, tuple)) and len(inputs) and isinstance(inputs[0], np.ndarray):
        file_list = list(inputs)
    else:
        file_list = _load_inputs(inputs)
    mask_list = _load_inputs(masks) if masks else None
    point_list = _load_inputs(point_masks) if point_masks else None
    file_list = shard_inputs_by_process(list(enumerate(file_list)), group_level)

    # gray->RGB only when the model consumes multi-channel input
    to_rgb = getattr(model, 'hparams', {}).get('in_channels', 3) != 1

    results = []
    for src_idx, src in file_list:
        name = (os.path.splitext(os.path.basename(src))[0]
                if isinstance(src, str) else f'array{src_idx}')
        try:
            out_fn = os.path.join(outputs, f'{name}.h5')
            if skip_existing:
                exists = os.path.isfile(out_fn)
                if jax.process_count() > 1 and group_level == 'job':
                    # the skip decision must be identical on every process
                    # (they enter collectives together): writer rank decides
                    from jax.experimental import multihost_utils
                    flags = np.asarray(multihost_utils.process_allgather(
                        np.asarray([int(exists)], np.int32)))
                    exists = bool(flags.reshape(-1)[0])
                if exists:
                    continue
            img = load_image(src, method=inputs_method,
                             dataset=inputs_dataset) if isinstance(src, str) else src
            if grayscale and img.ndim == 3 and img.shape[-1] > 1:
                # keep the original dtype: uint8 inputs must stay uint8 so
                # preprocess applies /255 scaling, not percentile stretching
                img = img.mean(-1).astype(img.dtype)
            img = preprocess(img, percentile=percentile, gamma=gamma, contrast=contrast,
                             brightness=brightness, to_rgb=to_rgb)
            mask = load_image(mask_list[src_idx],
                              dataset=masks_dataset) if mask_list else None
            pmask = load_image(point_list[src_idx],
                               dataset=point_masks_dataset) if point_list else None
            multi = (jax.process_count() > 1 and group_level == 'job'
                     and mask is None and pmask is None and reps == 1)
            if len(tiled_list) == 1:
                if multi:
                    # all processes on this input: split its tiles across
                    # processes (parity: cpn_inference.py:257-308)
                    from ..parallel.tiles import multihost_tiled_inference
                    res = multihost_tiled_inference(tiled, img)
                elif reps > 1:
                    from ..parallel.tiles import tta_inference
                    res = tta_inference(tiled, img, reps=reps, mask=mask,
                                        point_mask=pmask,
                                        point_mask_exclusive=point_mask_exclusive)
                else:
                    res = tiled(img, mask=mask, point_mask=pmask,
                                point_mask_exclusive=point_mask_exclusive)
            else:
                res = _ensemble(tiled_list, img, mask, pmask, min_vote,
                                model.nms_thresh, reps=reps,
                                point_mask_exclusive=point_mask_exclusive)
            h, w = img.shape[:2]
            if (jax.process_count() > 1 and group_level == 'job'
                    and jax.process_index() != 0):
                # With group_level='job' every process holds the same result —
                # via the multihost collective path or by redundant compute
                # (reps>1 / masks / ensemble). Exactly one writer per input,
                # or concurrent writers corrupt shared-filesystem outputs
                # (parity: rank 0 writes, cpn_inference.py:798-863).
                results.append(res)
                continue
            to_h5(out_fn,
                  contours=res['contours'], scores=res['scores'], boxes=res['boxes'],
                  classes=res['classes'],
                  attributes={'args': json.dumps(dict(
                      tile_size=tile_size, stride=stride, border_removal=border_removal,
                      stitching_rule=stitching_rule, precision=precision))})
            if labels or flat_labels or properties:
                if labels:
                    lbl = contours2labels(list(res['contours']), (h, w))
                    to_h5(out_fn, mode='a', labels=lbl)
                if flat_labels or properties:
                    # fast path: native scanline rasterizer (~100x cv2 loop);
                    # falls back to channelled render + dilation flattening
                    from ..native import contours2labels_native
                    flat = contours2labels_native(list(res['contours']), (h, w))
                    if flat_labels:
                        to_h5(out_fn, mode='a', flat_labels=flat)
                    if properties:
                        from ..data.misc import labels2property_table
                        tab = labels2property_table(flat, *properties, spacing=spacing,
                                                    separator=separator)
                        tab.to_csv(os.path.join(outputs, f'{name}.csv'), index=False)
            if overlay:
                ov = contours2overlay(res['contours'], (h, w),
                                      processes=overlay_processes)
                from ..util.io import to_tiff
                to_tiff(os.path.join(outputs, f'{name}_overlay.tiff'), ov)
            if demo_figure:
                from ..visualization.images import save_fig, show_detection
                ax = show_detection(image=img[..., 0] if img.ndim == 3 else img,
                                    contours=list(res['contours']))
                save_fig(os.path.join(outputs, f'{name}_demo.png'), ax.figure)
            results.append(res)
        except Exception as e:
            if continue_on_exception:
                print(f'cpn_inference: skipping {name}: {type(e).__name__}: {e}')
                continue
            raise
    return results


def main():
    p = argparse.ArgumentParser('cdt-inference-cpn',
                                description='Tiled CPN inference on TPU (celldetection_tpu)')
    p.add_argument('-i', '--inputs', nargs='+', required=True,
                   help='Input files or glob patterns')
    p.add_argument('-m', '--model', nargs='+', required=True,
                   help='Model name(s)/checkpoint path(s); multiple -> ensemble with box voting')
    p.add_argument('-o', '--outputs', default='outputs', help='Output directory')
    p.add_argument('--masks', nargs='*', default=None,
                   help='Optional fg masks (paired with inputs); suppress detections outside')
    p.add_argument('--point_masks', nargs='*', default=None,
                   help='Optional point-prompt masks (paired with inputs)')
    p.add_argument('--tile_size', type=int, default=1024)
    p.add_argument('--stride', type=int, default=768)
    p.add_argument('--batch_size', type=int, default=None)
    p.add_argument('--precision', default='32', choices=['32', 'bf16'])
    p.add_argument('--border_removal', type=int, default=4)
    p.add_argument('--stitching_rule', default='nms')
    p.add_argument('--score_thresh', type=float, default=None)
    p.add_argument('--nms_thresh', type=float, default=None)
    p.add_argument('--percentile', type=float, default=None)
    p.add_argument('--gamma', type=float, default=1.)
    p.add_argument('--contrast', type=float, default=1.)
    p.add_argument('--brightness', type=float, default=0.)
    p.add_argument('--group_level', default='rank', choices=['job', 'rank', 'node'])
    p.add_argument('--model_parameters', default=None,
                   help='Comma-separated key=value model attribute overrides')
    p.add_argument('--labels', action='store_true')
    p.add_argument('--flat_labels', action='store_true')
    p.add_argument('-p', '--properties', nargs='*', default=None)
    p.add_argument('--overlay', action='store_true')
    p.add_argument('--overlay_processes', type=int, default=None,
                   help='Parallel overlay rendering processes (gigapixel outputs)')
    p.add_argument('--demo_figure', action='store_true')
    p.add_argument('--continue_on_exception', action='store_true')
    p.add_argument('--reps', type=int, default=1,
                   help='Test-time augmentation over flips (1-4)')
    p.add_argument('--accelerator', default=None)
    p.add_argument('--devices', type=int, default=None)
    p.add_argument('--num_nodes', type=int, default=1)
    p.add_argument('--min_vote', type=int, default=1,
                   help='Ensemble box voting: min models that must agree')
    p.add_argument('--grayscale', action='store_true',
                   help='Convert multi-channel inputs to grayscale')
    p.add_argument('--inputs_method', default='imageio', choices=['imageio', 'tifffile'])
    p.add_argument('--separator', default='-',
                   help='Column separator for multi-valued region properties in CSVs')
    p.add_argument('--inputs_dataset', default='image', help='Default h5 key for inputs')
    p.add_argument('--masks_dataset', default='mask', help='Default h5 key for masks')
    p.add_argument('--point_masks_dataset', default='point_mask',
                   help='Default h5 key for point masks')
    p.add_argument('--point_mask_exclusive', action='store_true',
                   help='Only detect at point-marked pixels')
    p.add_argument('--skip_existing', action='store_true',
                   help='Skip inputs whose output h5 already exists')
    p.add_argument('--truncated_images', action='store_true',
                   help='Tolerate truncated image files (PIL)')
    p.add_argument('--model_kwargs', default=None,
                   help='JSON kwargs for model construction')
    p.add_argument('--spacing', type=float, nargs='+', default=None,
                   help='Physical pixel spacing for property export')
    args = vars(p.parse_args())
    cpn_inference(**{k: v for k, v in args.items()})


if __name__ == '__main__':
    main()
