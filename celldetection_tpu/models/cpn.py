"""Contour Proposal Network — TPU-native core + functional decode/loss.

Behavioral reference: ``celldetection/models/cpn.py`` — ``CPNCore`` (:126),
``CPN`` (:287, forward :561-734, compute_loss :441-559),
``local_refinement`` (:63), and the ``Cpn*`` model zoo (:771-2086).

TPU-first design (the central departure from the torch reference):
    The reference gathers foreground pixels with ``torch.where`` — a
    data-dependent shape that cannot compile to XLA. Here every selection is
    **capacity-padded**: per image, the top ``max_detections`` foreground
    pixels (by score at inference; random-priority at training) are selected
    with ``lax.top_k`` and carried through decode → refinement → NMS as fixed
    ``[B, K, ...]`` arrays with a boolean ``valid`` mask. The whole forward is
    one jit-compiled program; ragged per-image results are materialized only
    at the host boundary (``CPN.__call__``).
"""
import math
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import boxes as bx
from ..ops import loss as L
from ..ops.commons import downsample_labels, equal_size, process_scores
from ..ops.cpn import (batched_box_nms, fouriers2contours, order_weighting,
                       rel_location2abs_location, resolve_refinement_buckets, scale_contours,
                       scale_fourier)
from .commons import Fuse, FusableReadOut, ReadOut, ScaledTanh, fused_head_conv
from . import unet as unet_lib

__all__ = [
    'CPNCore', 'CPN', 'cpn_decode', 'cpn_compute_loss', 'get_cpn', 'models_by_name',
    'CpnU22', 'CpnSlimU22', 'CpnWideU22', 'CpnResUNet', 'CpnU17', 'CpnU12',
]


def _resolve_channels(feature_channels, keys, encoder_channels=None, encoder_prefix='encoder.'):
    """Total + first-key channels for a feature key (or tuple of keys)."""
    if not isinstance(keys, (list, tuple)):
        keys = [keys]
    channels = 0
    reference = None
    for k in keys:
        if isinstance(k, str) and k.startswith(encoder_prefix):
            c = encoder_channels[int(k[len(encoder_prefix):])]
        else:
            c = feature_channels[int(k)]
        channels += c
        if reference is None:
            reference = channels
    return channels, reference, len(keys)


def _resolve_features(features, keys):
    if len(features) == 1:
        # tensor-returning backbone: every head reads the single map (the
        # reference bypasses key resolution in this case, cpn.py forward)
        sole = next(iter(features.values()))
        return [sole] * len(keys) if isinstance(keys, (tuple, list)) else sole
    if isinstance(keys, (tuple, list)):
        return [features[k] for k in keys]
    return features[keys]


class CPNCore(nn.Module):
    """Backbone + dense CPN heads (score, location, Fourier, refinement, uncertainty).

    ``__call__`` returns a dict of NHWC dense outputs:
    ``scores [B,h,w,C] , locations [B,h,w,2], fourier [B,h,w,order*4],
    refinement [B,H,W,2*buckets] (input res) | None, uncertainty [B,h,w,4] | None``.
    """
    backbone: Any
    backbone_channels: Sequence[int]
    order: int
    score_channels: int
    refinement: bool = True
    refinement_margin: float = 3.
    uncertainty_head: bool = False
    contour_features: Any = '1'
    location_features: Any = '1'
    uncertainty_features: Any = '1'
    score_features: Any = '1'
    refinement_features: Any = '0'
    contour_head_channels: Optional[int] = None
    contour_head_stride: int = 1
    refinement_head_channels: Optional[int] = None
    refinement_head_stride: int = 1
    refinement_interpolation: str = 'bilinear'
    refinement_buckets: int = 1
    refinement_full_res: bool = True
    encoder_channels: Optional[Sequence[int]] = None
    kernel_size_score: int = 7
    kernel_size_location: int = 7
    kernel_size_fourier: int = 7
    kernel_size_refinement: int = 7
    kernel_size_uncertainty: int = 7
    head_activation: Any = 'relu'

    @nn.compact
    def __call__(self, inputs, train: bool = False) -> Dict[str, Optional[jnp.ndarray]]:
        assert self.refinement_buckets >= 1
        enc_channels = self.encoder_channels or self.backbone_channels
        features = self.backbone(inputs, train)
        if isinstance(features, jnp.ndarray):
            features = {'0': features}

        def head(keys, out_c, ksize, name, channels_mid, stride, final_activation=None):
            feats = _resolve_features(features, keys)
            if isinstance(feats, list):
                _, ref_c, _ = _resolve_channels(self.backbone_channels, keys, enc_channels)
                feats = Fuse(ref_c, name=f'{name}_fuse')(feats, train)
            return ReadOut(out_c, kernel_size=ksize, channels_mid=channels_mid, stride=stride,
                           activation=self.head_activation, final_activation=final_activation,
                           name=f'{name}_head')(feats, train)

        # The contour heads (score/location/fourier [+uncertainty]) normally
        # read the SAME feature map with the SAME conv geometry; when they do,
        # their KxK convs fuse into ONE conv with concatenated output channels
        # (fused_head_conv — full MXU tiles + one HBM pass over the map
        # instead of 3-4; the heads are ~half the CpnU22 FLOPs at batch 1).
        # Param tree is unchanged (FusableReadOut == ReadOut layout).
        specs = [('score', self.score_features, self.score_channels,
                  self.kernel_size_score, None),
                 ('location', self.location_features, 2,
                  self.kernel_size_location, None),
                 ('fourier', self.contour_features, self.order * 4,
                  self.kernel_size_fourier, None)]
        if self.uncertainty_head:
            specs.append(('uncertainty', self.uncertainty_features, 4,
                          self.kernel_size_uncertainty, 'sigmoid'))
        resolved = [_resolve_features(features, k) for _, k, *_ in specs]
        fusable = (not any(isinstance(f, list) for f in resolved)
                   and all(f is resolved[0] for f in resolved)
                   and len({ks for *_, ks, _ in specs}) == 1)
        outs = {}
        if fusable:
            x0 = resolved[0]
            mods, kernels, biases = [], [], []
            for name, _, out_c, ksize, fa in specs:
                m = FusableReadOut(out_c, kernel_size=ksize,
                                   channels_mid=self.contour_head_channels,
                                   stride=self.contour_head_stride,
                                   activation=self.head_activation,
                                   final_activation=fa, name=f'{name}_head')
                k, b = m(x0, train, mode='weights')
                mods.append(m)
                kernels.append(k)
                biases.append(b)
            mid_all = fused_head_conv(x0, kernels, biases,
                                      self.contour_head_stride,
                                      specs[0][3] // 2)
            off = 0
            for m, (name, *_), k in zip(mods, specs, kernels):
                c = k.shape[-1]
                outs[name] = m(x0, train, mode='tail',
                               mid=mid_all[..., off:off + c])
                off += c
        else:
            for name, keys, out_c, ksize, fa in specs:
                outs[name] = head(keys, out_c, ksize, name,
                                  self.contour_head_channels,
                                  self.contour_head_stride,
                                  final_activation=fa)
        scores, locations, fourier = outs['score'], outs['location'], outs['fourier']
        uncertainty = outs.get('uncertainty')
        refinement = None
        if self.refinement:
            ref_feats = _resolve_features(features, self.refinement_features)
            if isinstance(ref_feats, list):
                _, ref_c, _ = _resolve_channels(self.backbone_channels, self.refinement_features,
                                                enc_channels)
                ref_feats = Fuse(ref_c, name='refinement_fuse')(ref_feats, train)
            if self.refinement_full_res:
                ref_feats = equal_size(ref_feats, inputs, mode=self.refinement_interpolation)
            refinement = ReadOut(2 * self.refinement_buckets, kernel_size=self.kernel_size_refinement,
                                 channels_mid=self.refinement_head_channels,
                                 stride=self.refinement_head_stride,
                                 activation=self.head_activation,
                                 final_activation=ScaledTanh(self.refinement_margin),
                                 name='refinement_head')(ref_feats, train)
            refinement = equal_size(refinement, inputs, mode=self.refinement_interpolation)
        return dict(scores=scores, locations=locations, refinement=refinement,
                    fourier=fourier, uncertainty=uncertainty)


# ---------------------------------------------------------------------------
# Functional decode / loss (pure, fixed-shape)
# ---------------------------------------------------------------------------

def _gather_hw(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, K, ...] entries from spatial maps [B, h, w, ...] by flat hw index.

    Lowered as ONE flat row gather over [B*h*w, prod(rest)] with globalized
    indices: each index pulls a contiguous row, so XLA:TPU issues K row-DMAs
    instead of K*prod(rest) element gathers (take_along_axis broadcasts the
    index over trailing dims and is ~2-4x slower for the hot refinement
    lookups at 1024^2; measured on v5e).
    """
    b, h, w = x.shape[:3]
    rest = x.shape[3:]
    row = 1
    for r in rest:
        row *= r
    flat = x.reshape(b * h * w, row)
    gi = idx.astype(jnp.int32) + (jnp.arange(b, dtype=jnp.int32) * (h * w))[:, None]
    out = jnp.take(flat, gi.reshape(-1), axis=0)
    return out.reshape(b, idx.shape[1], *rest)


def local_refinement(contours: jnp.ndarray, refinement: jnp.ndarray, num_loops: int,
                     num_buckets: int, original_size, sampling: Optional[jnp.ndarray]):
    """Iterative offset-field refinement of contour coordinates.

    Args:
        contours: ``[B, K, S, 2]`` (x, y) in input resolution.
        refinement: ``[B, H, W, 2 * num_buckets]`` offset field.
        num_loops: Refinement iterations (static).
        num_buckets: Refinement buckets; 3-tap triangle mixing when > 1.
        original_size: (H, W).
        sampling: ``[B, K, S]`` or ``[S]`` contour parameter (for buckets).

    Returns:
        ``(refined, all_iterations)`` — parity: ``celldetection/models/cpn.py:63-85``.
    """
    h, w = original_size
    all_out = []
    det = contours
    for _ in range(num_loops):
        det = jax.lax.stop_gradient(jnp.round(det))
        det = jnp.stack([jnp.clip(det[..., 0], 0, w - 1), jnp.clip(det[..., 1], 0, h - 1)], -1)
        xi = det[..., 0].astype(jnp.int32)
        yi = det[..., 1].astype(jnp.int32)
        flat = yi * w + xi                                     # [B, K, S]
        b, k, s = flat.shape
        resp_all = _gather_hw(refinement, flat.reshape(b, k * s)).reshape(b, k, s, -1)
        resp_all = resp_all.astype(det.dtype)  # field may be bf16; positions stay fp32
        if num_buckets == 1:
            responses = resp_all[..., :2]
        else:
            responses = None
            for bucket_indices, bucket_weights in resolve_refinement_buckets(sampling, num_buckets):
                bi = jnp.broadcast_to(bucket_indices, (b, k, s)).astype(jnp.int32)
                pair = jnp.stack((bi * 2, bi * 2 + 1), -1)     # [B, K, S, 2]
                cur = jnp.take_along_axis(resp_all, pair, axis=-1)
                cur = cur * jnp.broadcast_to(bucket_weights, (b, k, s))[..., None]
                responses = cur if responses is None else responses + cur
        det = det + responses
        all_out.append(det)
    return det, all_out


def cpn_decode(dense: Dict[str, jnp.ndarray], input_size: Tuple[int, int], *,
               order: int, samples: int, score_channels: int, score_thresh,
               max_detections: int, refinement_iterations: int, refinement_buckets: int,
               certainty_thresh: Optional[float] = None, sampling: Optional[jnp.ndarray] = None,
               labels: Optional[jnp.ndarray] = None, priority: Optional[jnp.ndarray] = None,
               scores_lower_bound=None, scores_upper_bound=None,
               offsets: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Dense head outputs → capacity-padded detections (no NMS).

    Args:
        dense: CPNCore output dict.
        input_size: (H, W) of the model input.
        labels: Optional ``[B, H', W']`` training labels (else derived from scores).
        priority: Optional ``[B, h, w]`` selection priority (training: random).
        sampling: Optional ``[B, S]`` contour sampling (training).
        offsets: Optional ``[B, 2]`` xy offsets shifting outputs to global coords.

    Returns:
        Dict of padded arrays: ``contours [B,K,S,2], boxes [B,K,4], scores
        [B,K], classes [B,K], locations [B,K,2], fourier [B,K,order,4],
        contour_proposals, all_refined (tuple), box_uncertainties, valid
        [B,K], fg_index [B,K], fg_count [B]``.
    """
    raw_scores = dense['scores']
    b_dim, h, w = raw_scores.shape[:3]
    scores, classes = process_scores(raw_scores, score_channels, score_thresh,
                                     scores_lower_bound, scores_upper_bound)
    fourier = dense['fourier'].reshape(b_dim, h, w, -1, 4)[..., :order, :]
    uncertainty = dense['uncertainty']

    if labels is None:
        labels = classes
    else:
        labels = downsample_labels(labels.astype(jnp.float32), (h, w))
    fg_mask = labels > 0
    if certainty_thresh is not None and uncertainty is not None:
        fg_mask = fg_mask & (uncertainty.mean(-1) < (1 - certainty_thresh))

    # Selection score per pixel (class prob for multiclass, fg prob otherwise).
    if score_channels in (1, 2):
        sel_score = scores[..., 0]
    else:
        sel_score = jnp.take_along_axis(scores, classes[..., None], -1)[..., 0]
    if priority is None:
        priority = sel_score
    neg = jnp.full_like(priority, -jnp.inf)
    flat_priority = jnp.where(fg_mask, priority, neg).reshape(b_dim, h * w)
    # small inputs can have fewer score-map pixels than capacity: top_k
    # requires k <= h*w, so select what exists and pad the rest invalid
    k = min(max_detections, h * w)
    top_vals, top_idx = jax.lax.top_k(flat_priority, k)         # [B, k]
    if k < max_detections:
        pad = max_detections - k
        top_vals = jnp.concatenate(
            [top_vals, jnp.full((b_dim, pad), -jnp.inf, top_vals.dtype)], -1)
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros((b_dim, pad), top_idx.dtype)], -1)
    valid = jnp.isfinite(top_vals)
    fg_count = fg_mask.reshape(b_dim, -1).sum(-1)

    locations_abs = rel_location2abs_location(dense['locations'], channels_last=True)
    sel_fourier = _gather_hw(fourier, top_idx)                 # [B, K, order, 4]
    sel_locations = _gather_hw(locations_abs, top_idx)         # [B, K, 2]
    sel_classes = _gather_hw(classes[..., None], top_idx)[..., 0]
    sel_scores = _gather_hw(sel_score[..., None], top_idx)[..., 0]
    sel_uncertainty = _gather_hw(uncertainty, top_idx) if uncertainty is not None else None
    sel_labels = _gather_hw(labels[..., None].astype(jnp.float32), top_idx)[..., 0]

    if sampling is not None:
        samp = sampling[:, None, :]                             # [B, 1, S] broadcast over K
        samp_b = jnp.broadcast_to(samp, (b_dim, max_detections, sampling.shape[-1]))
    else:
        samp_b = None
    proposals, samp_used = fouriers2contours(sel_fourier, sel_locations,
                                             samples=samples, sampling=samp_b)

    actual_size = (h, w)
    proposals = scale_contours(actual_size, input_size, proposals)
    sel_fourier, sel_locations = scale_fourier(actual_size, input_size, sel_fourier, sel_locations)

    refinement = dense['refinement']
    if refinement is not None and refinement_iterations > 0:
        contours, all_refined = local_refinement(
            proposals, refinement, num_loops=refinement_iterations,
            num_buckets=refinement_buckets, original_size=input_size, sampling=samp_used)
    else:
        contours, all_refined = proposals, [proposals]
    clamp = lambda c: jnp.stack([jnp.clip(c[..., 0], 0, input_size[1] - 1),
                                 jnp.clip(c[..., 1], 0, input_size[0] - 1)], -1)
    all_refined = [clamp(c) for c in all_refined]
    contours = all_refined[-1]
    boxes = jnp.concatenate((contours.min(-2), contours.max(-2)), -1)

    out = dict(contours=contours, boxes=boxes, scores=sel_scores, classes=sel_classes,
               locations=sel_locations, fourier=sel_fourier, contour_proposals=proposals,
               all_refined=tuple(all_refined), box_uncertainties=sel_uncertainty,
               valid=valid, fg_index=top_idx, fg_labels=sel_labels, fg_count=fg_count,
               dense_scores=raw_scores, dense_labels=labels)
    if offsets is not None:
        out = apply_detection_offsets(out, offsets)
    return out


def apply_detection_offsets(decoded: Dict[str, jnp.ndarray], offsets) -> dict:
    """Shift all coordinate-valued outputs to global coordinates.

    Applied AFTER any loss computation (the reference offsets outputs post
    ``compute_loss`` — '(loss calc etc. not affected)', cpn.py:700-706).
    """
    off = offsets[:, None]                                      # [B, 1, 2]
    out = dict(decoded)
    out['contours'] = decoded['contours'] + off[:, :, None]
    out['contour_proposals'] = decoded['contour_proposals'] + off[:, :, None]
    out['all_refined'] = tuple(c + off[:, :, None] for c in decoded['all_refined'])
    out['boxes'] = decoded['boxes'] + jnp.concatenate([off, off], -1)
    out['locations'] = decoded['locations'] + off
    return out


# Loss weights — parity: ``celldetection/models/cpn.py:425-435``.
DEFAULT_WEIGHTS = {
    'fourier': 1., 'location': 1., 'contour': 3., 'score_bg': 1., 'score_fg': 1.,
    'refinement': 1., 'boxes': .88, 'iou': 1., 'uncertainty': 1.,
}


def cpn_compute_loss(decoded: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray], *,
                     score_channels: int, order_weights: Union[jnp.ndarray, float] = 1.,
                     weights: Dict[str, float] = None, uncertainty_factor: float = 7.,
                     uncertainty_head: bool = False,
                     iou_loss_enabled: bool = True, box_loss_enabled: bool = False,
                     refinement_enabled: bool = True):
    """CPN multi-objective loss on capacity-padded selections.

    Score losses are computed densely over fg/bg masks (mathematically equal
    to the reference's pixel-gathered means); regression losses are masked
    means over the selected fg pixels.

    Parity: ``celldetection/models/cpn.py:441-559``.
    """
    weights = DEFAULT_WEIGHTS if weights is None else weights
    raw_scores = decoded['dense_scores']
    labels = decoded['dense_labels']
    valid = decoded['valid']
    b = jnp.arange(raw_scores.shape[0])[:, None]

    fg_mask = labels > 0
    bg_mask = labels == 0

    losses = {}

    # --- dense score loss (fg/bg weighted separately) -----------------------
    class_targets = targets.get('classes')
    if score_channels == 1:
        logits = raw_scores[..., 0]
        if class_targets is not None:
            # fg targets come from per-instance classes even in the binary
            # case (ref: 'ones = class_targets[b, fg_indices]', cpn.py:510-513)
            bsz, hh, ww = labels.shape
            lbl_map = jnp.clip(labels.astype(jnp.int32) - 1, 0)
            fg_tgt = jnp.take_along_axis(class_targets.astype(jnp.float32),
                                         lbl_map.reshape(bsz, -1), 1).reshape(bsz, hh, ww)
        else:
            fg_tgt = jnp.ones_like(logits)
        losses['score'] = (weights['score_fg'] * L.bce_with_logits(logits, fg_tgt, mask=fg_mask)
                           + weights['score_bg'] * L.bce_with_logits(logits, jnp.zeros_like(logits), mask=bg_mask))
    else:
        lbl_idx_map = jnp.clip(labels.astype(jnp.int32) - 1, 0)
        if class_targets is not None:
            bsz, hh, ww = labels.shape
            cls_map = jnp.take_along_axis(class_targets.astype(jnp.int32),
                                          lbl_idx_map.reshape(bsz, -1), 1).reshape(bsz, hh, ww)
        else:
            cls_map = jnp.ones_like(lbl_idx_map)
        tgt = jnp.where(fg_mask, cls_map, 0)
        losses['score'] = (weights['score_fg'] * L.cross_entropy(raw_scores, tgt, mask=fg_mask)
                           + weights['score_bg'] * L.cross_entropy(raw_scores, jnp.zeros_like(tgt), mask=bg_mask))

    # --- gathered regression losses ----------------------------------------
    lbl_idx = jnp.clip(decoded['fg_labels'].astype(jnp.int32) - 1, 0)  # [B, K]

    def take_target(t):
        if t is None:
            return None
        idx = lbl_idx.reshape(lbl_idx.shape + (1,) * (t.ndim - 2)).astype(jnp.int32)
        idx = jnp.broadcast_to(idx, lbl_idx.shape + t.shape[2:])
        return jnp.take_along_axis(t, idx, axis=1)

    fourier_t = take_target(targets.get('fourier'))
    location_t = take_target(targets.get('locations'))
    contour_t = take_target(targets.get('sampled_contours'))
    hires_t = take_target(targets.get('hires_sampled_contours'))
    box_t = take_target(targets.get('boxes'))

    if fourier_t is not None:
        losses['fourier'] = weights['fourier'] * L.masked_mean(
            jnp.abs(decoded['fourier'] - fourier_t) * order_weights, valid)
    if location_t is not None:
        losses['location'] = weights['location'] * L.l1_loss(
            decoded['locations'], location_t, mask=valid)
    if contour_t is not None:
        losses['contour'] = weights['contour'] * L.l1_loss(
            decoded['contour_proposals'], contour_t, mask=valid)
        if box_t is None:
            box_t = jnp.concatenate((contour_t.min(-2), contour_t.max(-2)), -1)
        if refinement_enabled:
            # guarded like the reference ('self.refinement and
            # refinement_iterations > 0', cpn.py:539) — with refinement off,
            # all_refined holds only the clamped proposals and must not add
            # a duplicate contour objective
            cc_tar = hires_t if hires_t is not None else contour_t
            refinement_loss = 0.
            for ref_con in decoded['all_refined']:
                refinement_loss = refinement_loss + weights['refinement'] * L.l1_loss(
                    ref_con, cc_tar, mask=valid)
            losses['refinement'] = refinement_loss
    if box_t is not None:
        if iou_loss_enabled:
            losses['iou'] = weights['iou'] * L.iou_loss(decoded['boxes'], box_t, min_size=1.,
                                                        mask=valid)
        if box_loss_enabled:
            losses['boxes'] = weights['boxes'] * L.iou_loss(decoded['boxes'], box_t,
                                                            generalized=True, mask=valid)
        if uncertainty_head and decoded['box_uncertainties'] is not None:
            losses['uncertainty'] = weights['uncertainty'] * L.box_npll_loss(
                decoded['box_uncertainties'], jax.lax.stop_gradient(decoded['boxes']), box_t,
                factor=uncertainty_factor, sigmoid=False, min_size=1., mask=valid)

    loss = sum(losses.values())
    return loss, losses


# ---------------------------------------------------------------------------
# User-facing CPN model
# ---------------------------------------------------------------------------

class CPN:
    """Contour Proposal Network (user-facing).

    Wraps a :class:`CPNCore` flax module plus decode settings; behaves like the
    reference ``cd.models.CPN``: calling it on a (batch of) image(s) returns a
    dict with per-image ``contours, boxes, scores, classes, locations,
    fourier, contour_proposals, box_uncertainties`` lists.

    Args (selection — parity with reference, plus TPU capacity knobs):
        backbone: A flax backbone module exposing ``feature_channels``.
        order / nms_thresh / score_thresh / samples / classes /
        refinement* / certainty_thresh / uncertainty*: see reference docstring
            ``celldetection/models/cpn.py:322-366``.
        max_detections: Detection capacity K per image (TPU static shape).
    """

    def __init__(self, backbone, order: int = 5, nms_thresh: float = .2, score_thresh: float = .9,
                 certainty_thresh: float = None, samples: int = 32, classes: int = 2,
                 refinement: bool = True, refinement_iterations: int = 4,
                 refinement_margin: float = 3., refinement_buckets: int = 1,
                 contour_features='1', location_features='1', uncertainty_features='1',
                 score_features='1', refinement_features='0',
                 uncertainty_head: bool = False, uncertainty_nms: bool = False,
                 uncertainty_factor: float = 7.,
                 contour_head_channels: int = None, contour_head_stride: int = 1,
                 order_weights: bool = True, refinement_head_channels: int = None,
                 refinement_head_stride: int = 1, refinement_interpolation: str = 'bilinear',
                 max_detections: int = 2048, dtype=jnp.float32,
                 compute_dtype=None, torch_init: bool = True, **kwargs):
        self.order = order
        self.nms_thresh = nms_thresh
        self.score_thresh = score_thresh
        self.certainty_thresh = certainty_thresh
        self.samples = samples
        self.classes = classes
        self.score_channels = 1 if classes in (1, 2) else classes
        self.refinement = refinement
        self.refinement_iterations = refinement_iterations
        self.refinement_buckets = refinement_buckets
        self.uncertainty_nms = uncertainty_nms
        self.uncertainty_factor = uncertainty_factor
        self.uncertainty_head = uncertainty_head
        self.max_detections = max_detections
        self.dtype = dtype
        # reference-matching init distributions (see init())
        self.torch_init = torch_init
        # Backbone/head compute dtype (e.g. jnp.bfloat16 for MXU-rate
        # inference). Params stay fp32; the decode chain always runs fp32.
        self.compute_dtype = compute_dtype
        # Inputs larger than max_imsize auto-route through tiled inference
        # (parity: lightning_base.py:782-801, forward_tiled). None disables.
        self.max_imsize = kwargs.pop('max_imsize', 2048)
        self.tile_size = kwargs.pop('tile_size', 1024)
        self.tile_stride = kwargs.pop('tile_stride', 512)
        self.weights = dict(DEFAULT_WEIGHTS)
        self.iou_loss_enabled = True
        self.box_loss_enabled = False
        # layer tweaks applied at trace time (util.conf2tweaks_), e.g.
        # {'batchnorm': {'momentum': .95}} — flax-momentum convention
        self.tweaks: dict = {}

        backbone_channels = getattr(backbone, 'feature_channels', None) or \
            getattr(backbone, 'out_channels', None)
        if backbone_channels is None:
            raise ValueError('Backbone must expose feature_channels or out_channels.')
        self.core = CPNCore(
            backbone=backbone, backbone_channels=tuple(backbone_channels), order=order,
            score_channels=self.score_channels, refinement=refinement,
            refinement_margin=refinement_margin, uncertainty_head=uncertainty_head,
            contour_features=contour_features, location_features=location_features,
            uncertainty_features=uncertainty_features, score_features=score_features,
            refinement_features=refinement_features,
            contour_head_channels=contour_head_channels, contour_head_stride=contour_head_stride,
            refinement_head_channels=refinement_head_channels,
            refinement_head_stride=refinement_head_stride,
            refinement_interpolation=refinement_interpolation,
            refinement_buckets=refinement_buckets,
        )
        self.order_weights = order_weighting(order) if (order_weights is True) else (
            jnp.asarray(order_weights) if not isinstance(order_weights, bool) else 1.)
        self.variables = None
        self._jit_cache = {}
        self.hparams = dict(order=order, nms_thresh=nms_thresh, score_thresh=score_thresh,
                            samples=samples, classes=classes, refinement=refinement,
                            refinement_iterations=refinement_iterations,
                            refinement_buckets=refinement_buckets,
                            uncertainty_head=uncertainty_head,
                            max_detections=max_detections, **kwargs)

    # -- initialization ------------------------------------------------------

    def init(self, rng=None, input_shape=(1, 256, 256, 3)):
        """Initialize parameters for a given NHWC input shape.

        By default parameters are re-drawn to match the torch reference's
        init distributions (``torch_init=False`` keeps flax defaults) — the
        round-3 trained-accuracy gap traced to init statistics, not to the
        loss/gradients/targets (scripts/diag_train_loss.py: loss components
        match to <0.1% and 25 lockstep Adam steps track).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x = jnp.zeros(input_shape, self.dtype)
        from .commons import norm_overrides
        with norm_overrides(getattr(self, 'tweaks', None)):
            self.variables = self.core.init({'params': rng}, x, False)
        if getattr(self, 'torch_init', True):
            from ..util.init import detect_encoder_family, torch_init_variables
            family = detect_encoder_family(self.core.backbone)
            self.variables = torch_init_variables(
                self.variables, jax.random.fold_in(rng, 0x70C4), family)
        if getattr(self, 'pretrained', False):
            from ..util.pretrained import apply_pretrained_
            apply_pretrained_(self, self.pretrained)
        return self.variables

    @property
    def params(self):
        return None if self.variables is None else self.variables.get('params')

    # -- pure forward --------------------------------------------------------

    def forward_padded(self, variables, inputs, *, score_thresh=None, train: bool = False,
                       targets: Optional[dict] = None, nms: bool = True,
                       offsets=None, scores_lower_bound=None, scores_upper_bound=None,
                       selection_rng=None, mutable=False):
        """Pure fixed-shape forward: dense heads → padded detections (+ loss).

        Under jit this is a single XLA program. Returns ``(out, new_model_state)``
        when ``mutable`` (training BN update), else ``out``.
        """
        score_thresh = self.score_thresh if score_thresh is None else score_thresh
        rngs = {'dropout': selection_rng} if (train and selection_rng is not None) else None
        cdt = self.compute_dtype
        if cdt is not None and not train:
            # Low-precision backbone path: cast params + input to the compute
            # dtype (MXU-rate), then decode in fp32.
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(cdt) if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
            variables = cast(variables)
            inputs = inputs.astype(cdt)
        from .commons import norm_overrides
        with norm_overrides(getattr(self, 'tweaks', None)):
            if mutable:
                dense, new_state = self.core.apply(variables, inputs, train, rngs=rngs,
                                                   mutable=['batch_stats'])
            else:
                dense = self.core.apply(variables, inputs, train, rngs=rngs)
                new_state = None
        if cdt is not None and not train:
            # Decode in fp32 — except the refinement offset field, which is
            # gathered pointwise (latency-bound): keeping it in the compute
            # dtype halves the bytes per row-DMA (offsets are bounded by the
            # ScaledTanh margin, so bf16 costs <0.5% relative there).
            dense = {k: (v if v is None or k == 'refinement'
                         else v.astype(jnp.float32))
                     for k, v in dense.items()}

        labels = priority = sampling = None
        if targets is not None:
            labels = targets.get('labels')
            sampling = targets.get('sampling')
            if train and selection_rng is not None:
                # Unbiased fg subsampling when capacity overflows.
                priority = jax.random.uniform(selection_rng, dense['scores'].shape[:3])

        decoded = cpn_decode(
            dense, inputs.shape[1:3], order=self.order, samples=self.samples,
            score_channels=self.score_channels, score_thresh=score_thresh,
            max_detections=self.max_detections,
            refinement_iterations=self.refinement_iterations if self.refinement else 0,
            refinement_buckets=self.refinement_buckets,
            certainty_thresh=self.certainty_thresh, sampling=sampling, labels=labels,
            priority=priority, scores_lower_bound=scores_lower_bound,
            scores_upper_bound=scores_upper_bound,
            # with targets, offsets apply after the loss (ref cpn.py:700-706)
            offsets=None if targets is not None else offsets)

        if targets is not None:
            loss, losses = cpn_compute_loss(
                decoded, targets, score_channels=self.score_channels,
                order_weights=self.order_weights, weights=self.weights,
                uncertainty_factor=self.uncertainty_factor,
                uncertainty_head=self.uncertainty_head,
                iou_loss_enabled=self.iou_loss_enabled, box_loss_enabled=self.box_loss_enabled,
                refinement_enabled=bool(self.refinement)
                and self.refinement_iterations > 0)
            decoded['loss'] = loss
            decoded['losses'] = losses
            if offsets is not None:
                decoded = apply_detection_offsets(decoded, offsets)

        if not train and nms:
            if self.uncertainty_nms and decoded['box_uncertainties'] is not None:
                nms_w = decoded['scores'] * (1. - decoded['box_uncertainties'].mean(-1))
            else:
                nms_w = decoded['scores']
            keep = batched_box_nms(decoded['boxes'], nms_w, decoded['valid'], self.nms_thresh)
            decoded['valid'] = decoded['valid'] & keep
        if mutable:
            return decoded, new_state
        return decoded

    def _jitted(self, nms: bool):
        # keyed by compute dtype so precision toggles (Inference(amp=...))
        # reuse their compiled programs instead of recompiling
        tweak_key = tuple(sorted((k, tuple(sorted(v.items()))) for k, v in
                                 (getattr(self, 'tweaks', None) or {}).items()))
        key = ('infer', nms, self.compute_dtype, tweak_key)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v, x, st: self.forward_padded(v, x, score_thresh=st, nms=nms))
        return self._jit_cache[key]

    # -- user API ------------------------------------------------------------

    def prepare_inputs(self, inputs) -> jnp.ndarray:
        """Accept numpy/jnp HWC, NHWC or NCHW images; uint8 → float/255; → NHWC float."""
        x = np.asarray(inputs) if not isinstance(inputs, jnp.ndarray) else inputs
        if x.ndim == 2:
            x = x[..., None]
        if x.ndim == 3:
            x = x[None]
        in_c = self.hparams.get('in_channels') if hasattr(self, 'hparams') else None
        if in_c is not None and x.shape[1] != x.shape[-1]:
            # unambiguous: the channel axis is wherever in_channels matches
            nchw = x.shape[1] == in_c and x.shape[-1] != in_c
        else:
            nchw = x.shape[1] <= 8 < x.shape[-1]  # fallback heuristic
        if nchw:
            x = jnp.moveaxis(jnp.asarray(x), 1, -1) if isinstance(x, jnp.ndarray) \
                else np.moveaxis(x, 1, -1)
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.
        elif isinstance(inputs, np.ndarray) and np.issubdtype(np.asarray(inputs).dtype, np.floating):
            # Host-side misuse check (numpy inputs only — no device sync): a
            # float input in 0-255 scale would be flattened to ~all-ones by
            # the in-graph Normalize clamp; surface it instead (the reference
            # asserts, celldetection/models/commons.py Normalize).
            hi = float(np.max(inputs)) if np.asarray(inputs).size else 0.
            if hi > 2.:
                import warnings
                warnings.warn(
                    f'prepare_inputs: float input with max {hi:.3g} exceeds the '
                    f'expected [0, 1] range; values are clamped by Normalize. '
                    f'Scale inputs to [0, 1] (or pass uint8).')
        return x.astype(jnp.float32)

    def __call__(self, inputs, targets=None, nms: bool = True, score_thresh=None,
                 scores_lower_bound=None, scores_upper_bound=None, **kwargs):
        """Reference-style forward: per-image result lists (+ loss with targets).

        With ``targets`` the result includes ``loss``/``losses`` like the
        reference ``CPN.forward``; score bounds (mask / point-prompt fields)
        are threaded through to the decode. Inputs exceeding ``max_imsize``
        are processed through the tiled sliding-window pipeline (results in
        global coordinates, single-image only — parity with ``forward_tiled``).
        """
        x = self.prepare_inputs(inputs)
        if self.max_imsize is not None and max(x.shape[1:3]) > self.max_imsize:
            from ..parallel.tiles import TiledInference
            assert x.shape[0] == 1, 'Auto-tiled forward expects a single image.'
            assert targets is None, 'Auto-tiled forward is inference-only.'
            tiled = TiledInference(self, tile_size=self.tile_size, stride=self.tile_stride)
            res = tiled(np.asarray(x[0]), score_thresh=score_thresh)
            # align the schema with the detach() path
            out = {k: ([v] if isinstance(v, np.ndarray) else v) for k, v in res.items()}
            out['fg_overflow'] = out.pop('overflow', False)
            out.setdefault('contour_proposals', None)
            out.setdefault('box_uncertainties', None)
            return out
        if self.variables is None:
            self.init(input_shape=x.shape)
        st = jnp.asarray(self.score_thresh if score_thresh is None else score_thresh,
                         jnp.float32)
        if targets is not None or scores_lower_bound is not None \
                or scores_upper_bound is not None:
            tgt = None if targets is None else \
                {k: jnp.asarray(v) for k, v in targets.items()}
            out = self.forward_padded(self.variables, x, score_thresh=st, nms=nms,
                                      targets=tgt,
                                      scores_lower_bound=scores_lower_bound,
                                      scores_upper_bound=scores_upper_bound)
            result = self.detach(out)
            if 'loss' in out:
                result['loss'] = np.asarray(out['loss'])
                result['losses'] = {k: (None if v is None else np.asarray(v))
                                    for k, v in out['losses'].items()}
            return result
        out = self._jitted(nms)(self.variables, x, st)
        return self.detach(out)

    @staticmethod
    def detach(out: Dict[str, jnp.ndarray]) -> Dict[str, list]:
        """Padded device arrays → per-image ragged numpy lists (host boundary)."""
        valid = np.asarray(out['valid'])
        result = {}
        keys = ['contours', 'boxes', 'scores', 'classes', 'locations', 'fourier',
                'contour_proposals', 'box_uncertainties']
        for k in keys:
            v = out.get(k)
            if v is None:
                result[k] = None
                continue
            v = np.asarray(v)
            result[k] = [v[i][valid[i]] for i in range(v.shape[0])]
        if 'loss' in out:
            result['loss'] = np.asarray(out['loss'])
            result['losses'] = {k: (None if v is None else np.asarray(v))
                                for k, v in out['losses'].items()}
        # capacity saturation: more fg pixels existed than max_detections slots
        k = out['valid'].shape[1]
        result['fg_overflow'] = [bool(c > k) for c in np.asarray(out['fg_count'])]
        return result


# ---------------------------------------------------------------------------
# Model zoo
# ---------------------------------------------------------------------------

models_by_name = {}


def register_model(fn):
    models_by_name[fn.__name__] = fn
    return fn


def _make_cpn(backbone_fn, in_channels, backbone_kwargs=None, **kwargs):
    backbone_kwargs = backbone_kwargs or {}
    cpn_kwargs = {k: v for k, v in kwargs.items()}
    # ImageNet init (parity: celldetection/models/resnet.py:15-25,236-262):
    # recorded here, applied after `init()` creates the parameter tree.
    pretrained = backbone_kwargs.pop('pretrained', False)
    backbone = backbone_fn(in_channels, 0, backbone_kwargs=backbone_kwargs)
    model = CPN(backbone=backbone, **cpn_kwargs)
    model.pretrained = pretrained
    model.hparams.update(in_channels=in_channels, backbone_kwargs=backbone_kwargs)
    return model


@register_model
def CpnU22(in_channels: int, order: int = 5, nms_thresh: float = .2, score_thresh: float = .9,
           samples: int = 32, classes: int = 2, refinement: bool = True,
           refinement_iterations: int = 4, refinement_margin: float = 3.,
           refinement_buckets: int = 1, backbone_kwargs: dict = None, **kwargs):
    """CPN with U22 backbone. Parity: ``celldetection/models/cpn.py:772``."""
    m = _make_cpn(unet_lib.U22, in_channels, backbone_kwargs, order=order, nms_thresh=nms_thresh,
                  score_thresh=score_thresh, samples=samples, classes=classes,
                  refinement=refinement, refinement_iterations=refinement_iterations,
                  refinement_margin=refinement_margin, refinement_buckets=refinement_buckets,
                  **kwargs)
    m.hparams['model'] = 'CpnU22'
    return m


@register_model
def CpnSlimU22(in_channels: int, backbone_kwargs: dict = None, **kwargs):
    """CPN with SlimU22 backbone. Parity: ``celldetection/models/cpn.py:850``."""
    m = _make_cpn(unet_lib.SlimU22, in_channels, backbone_kwargs, **kwargs)
    m.hparams['model'] = 'CpnSlimU22'
    return m


@register_model
def CpnWideU22(in_channels: int, backbone_kwargs: dict = None, **kwargs):
    """CPN with WideU22 backbone. Parity: ``celldetection/models/cpn.py:890``."""
    m = _make_cpn(unet_lib.WideU22, in_channels, backbone_kwargs, **kwargs)
    m.hparams['model'] = 'CpnWideU22'
    return m


@register_model
def CpnResUNet(in_channels: int, backbone_kwargs: dict = None, **kwargs):
    """CPN with residual U-Net backbone. Parity: ``celldetection/models/cpn.py:811``."""
    m = _make_cpn(unet_lib.ResUNet, in_channels, backbone_kwargs, **kwargs)
    m.hparams['model'] = 'CpnResUNet'
    return m


@register_model
def CpnU17(in_channels: int, backbone_kwargs: dict = None, **kwargs):
    m = _make_cpn(unet_lib.U17, in_channels, backbone_kwargs, **kwargs)
    m.hparams['model'] = 'CpnU17'
    return m


@register_model
def CpnU12(in_channels: int, backbone_kwargs: dict = None, **kwargs):
    m = _make_cpn(unet_lib.U12, in_channels, backbone_kwargs, **kwargs)
    m.hparams['model'] = 'CpnU12'
    return m


def _register_backbone_cpns():
    """Generate Cpn<Backbone> constructors for every backbone family.

    Zoo parity: ``celldetection/models/cpn.py:771-2086`` (the ~40 Cpn*
    classes, each pinning a backbone constructor).
    """
    from . import fpn as fpn_lib

    specs = {}
    for name in ['ResNet18', 'ResNet34', 'ResNet50', 'ResNet101', 'ResNet152',
                 'ResNeXt50', 'ResNeXt101', 'ResNeXt152', 'WideResNet50', 'WideResNet101']:
        specs[f'Cpn{name}UNet'] = getattr(unet_lib, f'{name}UNet')
        specs[f'Cpn{name}FPN'] = getattr(fpn_lib, f'{name}FPN')
    for name in ['ConvNeXtTiny', 'ConvNeXtSmall', 'ConvNeXtBase', 'ConvNeXtLarge',
                 'ConvNeXtV2Tiny', 'ConvNeXtV2Base', 'DenseNet121', 'DenseNet161',
                 'DenseNet169', 'DenseNet201', 'MobileNetV3Large', 'MobileNetV3Small']:
        specs[f'Cpn{name}UNet'] = getattr(unet_lib, f'{name}UNet')
    for name in ['MobileNetV3Large', 'MobileNetV3Small']:
        specs[f'Cpn{name}FPN'] = getattr(fpn_lib, f'{name}FPN')

    # MaNet decoders over ResNet encoders (the reference couples MaNet with
    # timm/smp encoders; ResNet encoders are the native equivalent here).
    from . import manet as manet_lib
    from . import resnet as resnet_lib

    def _manet_backbone(res_ctor):
        def ctor(in_channels, out_channels=0, backbone_kwargs=None, **kw):
            encoder = res_ctor(in_channels, **(backbone_kwargs or {}))
            return manet_lib.MaNet(body=encoder, **kw)
        return ctor

    specs['CpnResNet50MaNet'] = _manet_backbone(resnet_lib.ResNet50)
    specs['CpnResNet18MaNet'] = _manet_backbone(resnet_lib.ResNet18)

    # timm / smp encoder variants (host-executed backbones via pure_callback;
    # require the optional torch-side packages — reference zoo parity for
    # CpnTimmUNet :2001, CpnSmpUNet :1960, CpnTimmMaNet :2042, CpnSmpMaNet :1919).
    def _host_enc(adapter_name, model_name, in_channels, pretrained, backbone_kwargs):
        from .host_encoder import build_host_encoder
        return build_host_encoder(adapter_name, model_name, in_channels=in_channels,
                                  pretrained=pretrained, backbone_kwargs=backbone_kwargs)

    def _resolve_encoder(adapter_name, model_name, in_channels, pretrained,
                         backbone_kwargs):
        """Native flax encoder when the name has one; host callback otherwise.

        Returns ``(module, out_channels, out_strides)`` — the module runs on
        TPU for every name in ``host_encoder.NATIVE_ENCODER_NAMES`` (pass
        ``backbone_kwargs={'force_host': True}`` to skip native resolution).
        """
        from .host_encoder import HostEncoder, resolve_native_encoder
        bk = dict(backbone_kwargs or {})
        if not bk.pop('force_host', False):
            native = resolve_native_encoder(model_name, in_channels,
                                            backbone_kwargs=bk)
            if native is not None:
                return native, list(native.out_channels), list(native.out_strides)
        enc, trainable = _host_enc(adapter_name, model_name, in_channels,
                                   pretrained, bk)
        host = HostEncoder(enc, trainable=trainable)
        return host, list(enc.out_channels), list(enc.out_strides)

    def _host_unet(adapter_name):
        def ctor(in_channels, out_channels=0, model_name=None, backbone_kwargs=None,
                 pretrained=False, **kw):
            body, chans, strides = _resolve_encoder(adapter_name, model_name,
                                                    in_channels, pretrained,
                                                    backbone_kwargs)
            return unet_lib.UNet(body=body, in_channels_list=chans,
                                 in_strides_list=strides,
                                 out_channels=out_channels, **kw)
        return ctor

    def _host_manet(adapter_name):
        def ctor(in_channels, out_channels=0, model_name=None, backbone_kwargs=None,
                 pretrained=False, **kw):
            from . import manet as manet_lib2
            body, _, _ = _resolve_encoder(adapter_name, model_name, in_channels,
                                          pretrained, backbone_kwargs)
            return manet_lib2.MaNet(body=body, **kw)
        return ctor

    def _host_cpn(backbone_fn, cpn_name):
        def ctor(in_channels: int, model_name: str, backbone_kwargs: dict = None, **kwargs):
            from .host_encoder import HostEncoder
            bb_kwargs = dict(backbone_kwargs or {})
            pretrained = bb_kwargs.pop('pretrained', False)
            backbone = backbone_fn(in_channels, 0, model_name=model_name,
                                   backbone_kwargs=bb_kwargs, pretrained=pretrained)
            m = CPN(backbone=backbone, **kwargs)
            if pretrained and not isinstance(getattr(backbone, 'body', None),
                                             HostEncoder):
                # natively-resolved encoder: ImageNet weights are applied at
                # init time through the standard translation path (host
                # encoders load theirs inside the torch adapter instead)
                m.pretrained = pretrained
            # persist the full rebuild recipe (incl. trainable host encoders)
            # so save/load round-trips reconstruct the same param tree
            m.hparams.update(in_channels=in_channels, model=cpn_name,
                             model_name=model_name,
                             backbone_kwargs=dict(backbone_kwargs or {}))
            return m
        ctor.__name__ = cpn_name
        return ctor

    for nm, fn in (('CpnTimmUNet', _host_unet('timm')), ('CpnSmpUNet', _host_unet('smp')),
                   ('CpnTimmMaNet', _host_manet('timm')), ('CpnSmpMaNet', _host_manet('smp'))):
        specs[nm] = None  # handled separately below
        cpn_fn = _host_cpn(fn, nm)
        models_by_name[nm] = cpn_fn
        globals()[nm] = cpn_fn
        __all__.append(nm)

    # Fixed-encoder spelling: MiT-B5 MaNet (parity: CpnMiTB5MaNet,
    # celldetection/models/cpn.py:1718 — SmpMaNet with model_name='mit_b5').
    _smp_manet_cpn = models_by_name['CpnSmpMaNet']

    def CpnMiTB5MaNet(in_channels: int, backbone_kwargs: dict = None, **kwargs):
        kwargs.pop('model_name', None)  # fixed encoder; tolerate saved hparams
        m = _smp_manet_cpn(in_channels, model_name='mit_b5',
                           backbone_kwargs=backbone_kwargs, **kwargs)
        m.hparams['model'] = 'CpnMiTB5MaNet'
        return m

    CpnMiTB5MaNet.__name__ = 'CpnMiTB5MaNet'
    models_by_name['CpnMiTB5MaNet'] = CpnMiTB5MaNet
    globals()['CpnMiTB5MaNet'] = CpnMiTB5MaNet
    __all__.append('CpnMiTB5MaNet')
    specs = {k: v for k, v in specs.items() if v is not None}

    def make(cpn_name, backbone_fn):
        def ctor(in_channels: int, order: int = 5, nms_thresh: float = .2,
                 score_thresh: float = .9, samples: int = 32, classes: int = 2,
                 refinement: bool = True, refinement_iterations: int = 4,
                 refinement_margin: float = 3., refinement_buckets: int = 1,
                 backbone_kwargs: dict = None, **kwargs):
            m = _make_cpn(backbone_fn, in_channels, backbone_kwargs, order=order,
                          nms_thresh=nms_thresh, score_thresh=score_thresh, samples=samples,
                          classes=classes, refinement=refinement,
                          refinement_iterations=refinement_iterations,
                          refinement_margin=refinement_margin,
                          refinement_buckets=refinement_buckets, **kwargs)
            m.hparams['model'] = cpn_name
            return m
        ctor.__name__ = cpn_name
        ctor.__doc__ = (f'CPN with {cpn_name[3:]} backbone. '
                        f'Zoo parity: celldetection/models/cpn.py:771-2086.')
        return ctor

    for cpn_name, backbone_fn in specs.items():
        fn = make(cpn_name, backbone_fn)
        models_by_name[cpn_name] = fn
        globals()[cpn_name] = fn
        __all__.append(cpn_name)


_register_backbone_cpns()


def get_cpn(name: str):
    """Look up a CPN model constructor by name (parity: ``get_cpn``)."""
    if name not in models_by_name:
        raise KeyError(f'Unknown CPN model: {name}. Available: {sorted(models_by_name)}')
    return models_by_name[name]
