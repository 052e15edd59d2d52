"""Misc host-side data ops (numpy/cv2).

Behavioral reference: ``celldetection/data/misc.py`` — ``padding_stack``
(:114), ``universal_dict_collate_fn`` (:136), ``normalize_percentile`` (:156),
``random_crop`` (:193), ``rle2mask`` (:231), ``rgb_to_scalar`` (:264),
``labels2properties`` (:289), ``resample_contours`` (:371),
``pad_to_size``/``pad_to_div`` (:413-448).
"""
from collections import OrderedDict
from typing import List, Union

import numpy as np

__all__ = [
    'transpose_spatial', 'padding_stack', 'universal_dict_collate_fn', 'normalize_percentile',
    'random_crop', 'random_pad', 'rle2mask', 'rgb_to_scalar', 'resample_contours',
    'pad_to_size', 'pad_to_div', 'channels_first2channels_last', 'channels_last2channels_first',
    'labels2properties', 'labels2property_table', 'labels2crops', 'regionprops2d', 'split',
]


def channels_first2channels_last(x: np.ndarray, spatial_dims: int = 2, has_batch: bool = False) -> np.ndarray:
    c = x.ndim - spatial_dims - int(has_batch)
    perm = tuple(range(int(has_batch))) + tuple(range(x.ndim - spatial_dims, x.ndim)) + \
        tuple(range(int(has_batch), int(has_batch) + c))
    # simpler: move the channel axes to the end
    return np.moveaxis(x, int(has_batch), -1) if c == 1 else np.transpose(x, perm)


def channels_last2channels_first(x: np.ndarray, spatial_dims: int = 2, has_batch: bool = False) -> np.ndarray:
    return np.moveaxis(x, -1, int(has_batch))


def transpose_spatial(x: np.ndarray, inputs_channels_last: bool = True, spatial_dims: int = 2):
    """Bring an array to channels-last (the framework's native layout)."""
    if inputs_channels_last:
        return x
    return channels_first2channels_last(x, spatial_dims)


def padding_stack(*images, axis: int = 0) -> np.ndarray:
    """Stack arrays along a new axis, end-padding all dims to the largest extent."""
    if len(images) == 1 and isinstance(images[0], (list, tuple)):
        images = tuple(images[0])
    nd = max(i.ndim for i in images)
    shapes = [(1,) * (nd - i.ndim) + i.shape for i in images]
    target = tuple(max(s[d] for s in shapes) for d in range(nd))
    out = []
    for i in images:
        i = i.reshape((1,) * (nd - i.ndim) + i.shape)
        pad = [(0, t - s) for t, s in zip(target, i.shape)]
        out.append(np.pad(i, pad))
    return np.stack(out, axis)


def universal_dict_collate_fn(batch: List[dict], check_padding: bool = True) -> OrderedDict:
    """Collate a list of dicts into a dict of padding-stacked arrays.

    ``None`` items (e.g. skipped tiles) are dropped. Values that are lists of
    per-object arrays are padding-stacked with a companion ``<key>_size`` entry
    left to the caller. Parity: ``celldetection/data/misc.py:136-153``.
    """
    batch = [b for b in batch if b is not None]
    if len(batch) == 0:
        return OrderedDict()
    keys = batch[0].keys()
    out = OrderedDict()
    for k in keys:
        vals = [b[k] for b in batch]
        if vals[0] is None:
            out[k] = None
        elif isinstance(vals[0], np.ndarray):
            out[k] = padding_stack(*vals, axis=0)
        else:
            out[k] = vals
    return out


def normalize_percentile(image: np.ndarray, percentile=99.9, to_uint8: bool = False,
                         lower: float = None) -> np.ndarray:
    """Two-sided percentile normalization to [0, 1] (optionally uint8).

    Parity: the reference maps the (100-p)th..pth percentile window to [0, 1]
    with clipping (``celldetection/data/misc.py:156``) — a camera baseline is
    removed, not just divided through. ``percentile`` may be a (low, high)
    tuple; ``lower`` overrides the low percentile.
    """
    if isinstance(percentile, (list, tuple)):
        p_low, p_high = percentile
    else:
        p_low, p_high = 100. - percentile, percentile
    if lower is not None:
        p_low = lower
    low, high = np.percentile(image, (p_low, p_high))
    denom = max(high - low, 1e-12)
    img = (image.astype('float32') - low) / denom
    img = np.clip(img, 0., 1.)
    if to_uint8:
        img = (img * 255).astype('uint8')
    return img


def random_crop(*arrays, height: int, width: int = None, rng: np.random.RandomState = None):
    """Random crop applied consistently to all inputs (leading spatial dims)."""
    rng = rng or np.random
    width = width or height
    h, w = arrays[0].shape[:2]
    y = rng.randint(0, max(h - height, 0) + 1)
    x = rng.randint(0, max(w - width, 0) + 1)
    out = tuple(a[y:y + height, x:x + width] for a in arrays)
    return out if len(out) > 1 else out[0]


def random_pad(*arrays, height: int, width: int = None, rng: np.random.RandomState = None, **kwargs):
    """Random end/start padding to reach at least (height, width)."""
    rng = rng or np.random
    width = width or height
    h, w = arrays[0].shape[:2]
    ph, pw = max(0, height - h), max(0, width - w)
    ty, tx = (rng.randint(0, p + 1) if p else 0 for p in (ph, pw))
    out = tuple(np.pad(a, [(ty, ph - ty), (tx, pw - tx)] + [(0, 0)] * (a.ndim - 2), **kwargs)
                for a in arrays)
    return out if len(out) > 1 else out[0]


def rle2mask(code, size, transpose: bool = True, min_index: int = 1, constant: int = 1) -> np.ndarray:
    """Run-length code → binary mask. Parity: ``celldetection/data/misc.py:231``."""
    image = np.zeros(int(np.prod(size)), dtype=np.uint8)
    code = np.asarray(code).ravel()
    starts, lengths = code[::2] - min_index, code[1::2]
    for s, l in zip(starts, lengths):
        image[s:s + l] = constant
    image = image.reshape(size[::-1] if transpose else size)
    return image.T if transpose else image


def rgb_to_scalar(image: np.ndarray, dtype='int32') -> np.ndarray:
    """Pack an RGB label encoding into scalar labels."""
    image = image.astype(dtype)
    return image[..., 0] + (image[..., 1] << 8) + (image[..., 2] << 16)


def resample_contours(contours, num: Union[int, float, None] = None, close: bool = True,
                      epsilon: float = 1e-6):
    """Sample ``num`` equidistant points along each contour (arc length).

    Parity: ``celldetection/data/misc.py:371-405``. Works on a single
    ``Array[..., p, 2]`` or a list of such arrays.
    """
    if isinstance(contours, (list, tuple)):
        return type(contours)(resample_contours(c, num=num, close=close, epsilon=epsilon) for c in contours)
    pts = np.asarray(contours, dtype=float)
    if close:
        pts = np.concatenate((pts, pts[..., :1, :]), -2)
    # Arc-length profile per contour: arc[..., i] = length of the polyline up to
    # vertex i. Target samples are then located by a batched searchsorted over
    # the profile (each row shifted into a disjoint numeric range so a single
    # flat searchsorted resolves all rows at once).
    seg_len = np.linalg.norm(np.diff(pts, axis=-2), axis=-1) + epsilon
    arc = np.concatenate([np.zeros(seg_len.shape[:-1] + (1,), seg_len.dtype),
                          np.cumsum(seg_len, axis=-1)], axis=-1)
    total = arc[..., -1]
    if num is None or isinstance(num, float):
        num = int(np.max(np.round(total)) * (num if isinstance(num, float) else 1))
    t = total[..., None] * (np.arange(num, dtype=float) / num)

    p = pts.shape[-2]
    flat_arc = arc.reshape(-1, p)
    flat_t = t.reshape(-1, num)
    flat_pts = pts.reshape(-1, p, 2)
    rows = flat_arc.shape[0]
    stride = float(flat_arc[:, -1].max()) + 1.0
    shift = np.arange(rows, dtype=float)[:, None] * stride
    ins = np.searchsorted((flat_arc + shift).ravel(), (flat_t + shift).ravel())
    k = np.maximum(ins.reshape(rows, num) - np.arange(rows)[:, None] * p, 1) - 1
    r = np.arange(rows)[:, None]
    alpha = ((flat_t - flat_arc[r, k]) / (flat_arc[r, k + 1] - flat_arc[r, k]))[..., None]
    out = flat_pts[r, k] * (1 - alpha) + flat_pts[r, k + 1] * alpha
    return out.reshape(pts.shape[:-2] + (num, 2))


def pad_to_size(v: np.ndarray, size, **kwargs) -> np.ndarray:
    pad = [[0, max(0, a - b)] for a, b in zip(size, v.shape)]
    pad += [[0, 0]] * (v.ndim - len(pad))
    return np.pad(v, pad, **kwargs)


def pad_to_div(v: np.ndarray, div: int = 32, nd: int = 2, **kwargs) -> np.ndarray:
    if not isinstance(div, (tuple, list)):
        div = (div,) * nd
    size = [(i // d + bool(i % d)) * d for i, d in zip(v.shape, div)]
    return pad_to_size(v, size, **kwargs)


def labels2properties(labels: np.ndarray, *properties, offset=(0, 0), spacing=None):
    """Per-region property rows for the requested property names.

    Supported: label, bbox, image, coords, area, centroid. ``spacing`` scales
    area/centroid to physical units (parity: regionprops ``spacing``).
    """
    from ._regionprops import regionprops
    if len(properties) == 1 and isinstance(properties[0], (list, tuple)):
        properties, = properties
    if labels.ndim == 2:
        labels = labels[..., None]
    rows = []
    for z in range(labels.shape[2]):
        for p in regionprops(labels[..., z], spacing=spacing):
            row = []
            for name in properties:
                v = getattr(p, name)
                if name == 'bbox' and any(offset):
                    v = (v[0] + offset[0], v[1] + offset[1], v[2] + offset[0], v[3] + offset[1])
                elif name == 'coords' and any(offset):
                    v = v + np.asarray(offset)
                elif name == 'centroid' and any(offset):
                    # offset is in pixels; apply before physical scaling
                    off = np.asarray(offset, float)
                    if spacing is not None:
                        off = off * np.broadcast_to(
                            np.atleast_1d(np.asarray(spacing, float)), off.shape)
                    v = tuple(np.asarray(v) + off)
                row.append(v)
            rows.append(row if len(properties) > 1 else row[0])
    return rows


def regionprops2d(label_image: np.ndarray, **kwargs):
    """Region properties for possibly multi-channel label images (parity:
    ``regionprops2d``, ``celldetection/data/misc.py:451`` — a channel-aware
    generator over per-region property objects; labels may not yield in
    order)."""
    from ._regionprops import regionprops
    assert label_image.ndim in (2, 3)
    if label_image.ndim == 2:
        label_image = label_image[..., None]
    for z in range(label_image.shape[2]):
        yield from regionprops(label_image[..., z], **kwargs)


def split(n: int, *fractions, shuffle: bool = True, seed=None):
    """Partition ``range(n)`` into index sets by fractions summing to 1
    (parity: ``split``, ``celldetection/data/misc.py:489``)."""
    if abs(sum(fractions) - 1.) > 1e-9:
        raise ValueError('The sum of splits must be equal to 1.')
    rng = np.random.RandomState(seed)
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    bounds = np.cumsum([int(round(f * n)) for f in fractions])[:-1]
    return [np.sort(part) for part in np.split(idx, bounds)]


def labels2property_table(labels: np.ndarray, *properties, iter_channels: bool = True,
                          spacing=None, separator: str = '-', **kwargs):
    """Per-region property table as a ``pd.DataFrame`` (parity:
    ``labels2property_table``, ``celldetection/data/misc.py:320``).

    Channels of a multi-channel label image are iterated and concatenated
    unless ``iter_channels`` is False (then the full stack is processed as
    one n-d label image). Multi-valued properties expand into
    ``separator``-joined columns (``bbox-0`` ... like regionprops_table);
    ``spacing`` scales area/centroid to physical units.
    """
    import pandas as pd
    from ._regionprops import regionprops
    if len(properties) == 1 and isinstance(properties[0], (list, tuple)):
        properties, = properties
    if iter_channels and labels.ndim > 2:
        props = []
        for z in range(labels.shape[2]):
            props += regionprops(labels[..., z], spacing=spacing)
    else:
        props = regionprops(labels, spacing=spacing)
    nd = labels.ndim if not (iter_channels and labels.ndim > 2) else 2
    # deterministic schema, also for empty tables (vector properties of known
    # width expand the same way with or without regions)
    widths = {'bbox': 2 * nd, 'centroid': nd}
    columns = []
    for name in properties:
        if name in widths:
            columns += [f'{name}{separator}{i}' for i in range(widths[name])]
        else:
            columns.append(name)
    data = []
    for p in props:
        row = {}
        for name in properties:
            v = getattr(p, name)
            if np.ndim(v) == 0 or name == 'coords':
                row[name] = v
            else:
                for i, vi in enumerate(np.asarray(v).reshape(-1)):
                    row[f'{name}{separator}{i}'] = vi
        data.append(row)
        for k in row:
            if k not in columns:
                columns.append(k)
    return pd.DataFrame(data, columns=columns)


def labels2crops(labels: np.ndarray, image: np.ndarray):
    """Crop every labeled object from ``image``; returns (crops, masks)."""
    crops, masks = [], []
    for (y0, x0, y1, x1), mask in labels2properties(labels, 'bbox', 'image'):
        crops.append(image[y0:y1, x0:x1])
        masks.append(mask)
    return crops, masks
