"""Label-image utilities (numpy/cv2/scipy host-side).

Behavioral reference: ``celldetection/data/segmentation.py`` —
``remove_partials_`` (:10), ``fill_label_gaps_`` (:22), ``fill_padding_``
(:43), ``filter_instances_`` (:67), ``relabel_`` (:106), ``stack_labels``
(:133), ``unary_masks2labels`` (:153), ``boxes2masks`` (:170).
"""
import cv2
import numpy as np

from ._regionprops import connected_label
from .misc import rgb_to_scalar

__all__ = ['remove_partials_', 'fill_label_gaps_', 'filter_instances_', 'relabel_', 'stack_labels',
           'unary_masks2labels', 'boxes2masks', 'fill_padding_', 'remove_padding']


def remove_partials_(label_stack: np.ndarray, border: int = 1, constant: int = -1):
    """Inplace: set labels touching the image border to ``constant``.

    Border strips along the first two axes are flattened into one vector, the
    positive labels occurring there are collected, and every pixel carrying
    one of those labels (a single vectorized ``np.isin`` pass) is overwritten.
    """
    if border < 1:
        return label_stack, None
    strips = (label_stack[:border], label_stack[-border:],
              label_stack[:, :border], label_stack[:, -border:])
    edge_labels = np.unique(np.concatenate([s.ravel() for s in strips]))
    edge_labels = edge_labels[edge_labels != 0]
    mask = np.isin(label_stack, edge_labels)
    label_stack[mask] = constant
    return label_stack, mask


def fill_label_gaps_(labels: np.ndarray):
    """Inplace: make positive labels continuous in [1, n]. Labels <= 0 preserved.

    One vectorized pass: ``np.unique(..., return_inverse=True)`` over the
    positive pixels gives each label its dense rank; ranks + 1 are written
    back. O(P log U) with no per-label scans, regardless of gap count.
    """
    fg = labels > 0
    if not fg.any():
        return
    _, dense = np.unique(labels[fg], return_inverse=True)
    labels[fg] = dense + 1


def fill_padding_(inputs, padding: int, constant: int = -1, preserve_existing: bool = True, axes=(0, 1)):
    """Inplace: mark padded border rows/cols with ``constant``.

    With ``preserve_existing`` only pixels that are zero across the trailing
    channel axis are overwritten (padding never clobbers real instances).
    """
    if padding <= 0:
        return
    if isinstance(inputs, (list, tuple)):
        for item in inputs:
            fill_padding_(item, padding, constant, preserve_existing, axes)
        return
    for ax in axes:
        view = np.moveaxis(inputs, ax % inputs.ndim, 0)
        for band in (view[:padding], view[-padding:]):
            if preserve_existing:
                band[~band.any(-1)] = constant
            else:
                band[...] = constant


def remove_padding(inputs, padding: int):
    """Crop ``padding`` rows/cols from both sides of the leading two axes."""
    if isinstance(inputs, (list, tuple)):
        return [remove_padding(item, padding) for item in inputs]
    if padding <= 0:  # slice(0, -0) would return an empty array
        return inputs
    crop = (slice(padding, -padding),) * 2
    return inputs[crop]


def filter_instances_(labels: np.ndarray, partials: bool = True, partials_border: int = 1,
                      min_area: int = 4, max_area: int = None, constant: int = -1,
                      continuous: bool = True):
    """Inplace instance filter: border partials, area bounds, relabel continuous.

    Area screening is a single ``np.unique`` over foreground pixels followed
    by one vectorized ``np.isin`` rewrite of every out-of-bounds label.
    """
    if partials:
        remove_partials_(labels, border=partials_border, constant=constant)
    if min_area or max_area:
        uni, area = np.unique(labels[labels > 0], return_counts=True)
        out = np.zeros(uni.shape, bool)
        if min_area:
            out |= area < min_area
        if max_area:
            out |= area > max_area
        if out.any():
            labels[np.isin(labels, uni[out])] = constant
    if continuous:
        fill_label_gaps_(labels)


def relabel_(label_stack: np.ndarray, axis: int = 2):
    """Inplace relabeling to continuous labels starting at 1 (connected components).

    Negative labels remain untouched.
    """
    assert label_stack.ndim == 3
    neg_m = label_stack < 0
    cur_max = 0
    for channel in range(label_stack.shape[axis]):
        sel = (slice(None),) * axis + (channel,)
        stack_ = connected_label(label_stack[sel])
        for u in set(np.unique(stack_)) - {0}:
            mask = stack_ == u
            if np.any(np.logical_and(mask, neg_m[sel])):
                continue
            cur_max += 1
            label_stack[sel][mask] = cur_max


def stack_labels(*maps, axis: int = 2, dtype='int32', relabel: bool = True) -> np.ndarray:
    """Stack grayscale/RGB label maps into a channelled label image."""
    maps = [(rgb_to_scalar(m, dtype=dtype) if (m.ndim == 3 and m.shape[2] == 3) else m.astype(dtype))
            for m in maps]
    stack = np.stack(maps, axis=axis)
    if relabel:
        relabel_(stack, axis)
    return stack


def unary_masks2labels(unary_masks, transpose: bool = True) -> np.ndarray:
    """Per-object binary masks → label image (one channel per object)."""
    lbl = (np.asarray(unary_masks) > 0) * np.arange(1, len(unary_masks) + 1)[:, None, None]
    if transpose:
        lbl = lbl.transpose((1, 2, 0))
    return lbl


def boxes2masks(boxes, size):
    """Boxes → list of filled rectangle masks (label = index + 1)."""
    masks = []
    for idx, b in enumerate(boxes):
        mask = np.zeros(size, dtype='uint8')
        xmin, ymin, xmax, ymax = (int(v) for v in b)
        cv2.rectangle(mask, (xmin, ymin), (xmax, ymax), idx + 1, thickness=-1)
        masks.append(mask)
    return masks
