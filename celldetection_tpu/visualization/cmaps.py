"""Color maps for label images.

Behavioral reference: ``celldetection/visualization/cmaps.py`` —
``label_cmap`` (:10), ``random_colors_hsv`` (:21).
"""
import numpy as np

__all__ = ['random_colors_hsv', 'label_cmap']


def random_colors_hsv(num: int, hue_range=(0, 180), saturation_range=(60, 256),
                      value_range=(128, 256), ubyte: bool = True, seed=None):
    """Random HSV-sampled RGB colors (cv2 HSV conventions)."""
    import cv2
    rng = np.random.RandomState(seed)
    hsv = np.stack([rng.randint(*hue_range, num), rng.randint(*saturation_range, num),
                    rng.randint(*value_range, num)], -1).astype(np.uint8)
    rgb = cv2.cvtColor(hsv[None], cv2.COLOR_HSV2RGB)[0]
    if not ubyte:
        rgb = rgb.astype(np.float32) / 255.
    return [tuple(c) for c in rgb]


def label_cmap(labels: np.ndarray, seed=None, background=(0, 0, 0)) -> np.ndarray:
    """Label image → random-color RGB visualization."""
    labels = np.asarray(labels)
    if labels.ndim == 3:
        labels = labels.max(-1)
    n = int(labels.max())
    colors = np.array([background] + random_colors_hsv(max(n, 1), seed=seed), np.uint8)
    return colors[np.clip(labels, 0, n)]
