"""Plotting helpers (matplotlib, import-gated).

Behavioral reference: ``celldetection/visualization/images.py:25-448`` —
``imshow``, ``imshow_row/grid``, ``plot_contours``, ``plot_boxes``,
``plot_score``, ``plot_text``, ``show_detection``, ``quiver_plot``,
``figure2img``, ``save_fig``.
"""
from typing import Optional, Sequence

import numpy as np

__all__ = ['imshow', 'imshow_row', 'imshow_grid', 'imshow_col', 'plot_contours', 'plot_boxes',
           'plot_score', 'plot_text', 'plot_mask', 'show_detection', 'quiver_plot',
           'figure2img', 'save_fig', 'get_axes', 'plot_zstack', 'plot_gif']


def _plt():
    import matplotlib
    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    return plt


def imshow(image, figsize=None, ax=None, **kwargs):
    plt = _plt()
    if ax is None:
        if figsize is not None:
            plt.figure(figsize=figsize)
        ax = plt.gca()
    image = np.asarray(image)
    if image.ndim == 3 and image.shape[-1] == 1:
        image = image[..., 0]
    ax.imshow(image, cmap=kwargs.pop('cmap', 'gray' if image.ndim == 2 else None), **kwargs)
    ax.axis('off')
    return ax


def imshow_row(*images, figsize=(16, 9), titles=None, **kwargs):
    plt = _plt()
    fig, axes = plt.subplots(1, len(images), figsize=figsize)
    if len(images) == 1:
        axes = [axes]
    for i, (ax, im) in enumerate(zip(axes, images)):
        imshow(im, ax=ax, **kwargs)
        if titles:
            ax.set_title(titles[i])
    return fig


def imshow_grid(images, cols=4, figsize=(16, 9), **kwargs):
    plt = _plt()
    rows = int(np.ceil(len(images) / cols))
    fig, axes = plt.subplots(rows, cols, figsize=figsize)
    axes = np.atleast_1d(axes).ravel()
    for ax, im in zip(axes, images):
        imshow(im, ax=ax, **kwargs)
    for ax in axes[len(images):]:
        ax.axis('off')
    return fig


def plot_contours(contours, ax=None, color=None, linestyle='-', linewidth=1.5, fill=0.,
                  texts=None, **kwargs):
    plt = _plt()
    ax = ax or plt.gca()
    for i, con in enumerate(contours):
        con = np.asarray(con)
        closed = np.concatenate([con, con[:1]], 0)
        line, = ax.plot(closed[:, 0], closed[:, 1], linestyle=linestyle,
                        linewidth=linewidth, color=color, **kwargs)
        if fill:
            ax.fill(closed[:, 0], closed[:, 1], alpha=fill, color=line.get_color())
        if texts is not None:
            plot_text(str(texts[i]), con[:, 0].mean(), con[:, 1].min(), ax=ax)
    return ax


def plot_boxes(boxes, ax=None, color='deepskyblue', linewidth=1.0, **kwargs):
    plt = _plt()
    from matplotlib.patches import Rectangle
    ax = ax or plt.gca()
    for b in boxes:
        x0, y0, x1, y1 = np.asarray(b)
        ax.add_patch(Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                               edgecolor=color, linewidth=linewidth, **kwargs))
    return ax


def plot_score(scores, locations, ax=None, fmt='{:.2f}', **kwargs):
    plt = _plt()
    ax = ax or plt.gca()
    for s, (x, y) in zip(scores, locations):
        plot_text(fmt.format(float(s)), x, y, ax=ax, **kwargs)
    return ax


def plot_text(text, x, y, ax=None, color='black', backgroundcolor='white', fontsize=8, **kwargs):
    plt = _plt()
    ax = ax or plt.gca()
    ax.text(x, y, text, color=color, backgroundcolor=backgroundcolor, fontsize=fontsize,
            ha='center', **kwargs)
    return ax


def plot_mask(mask, ax=None, alpha=0.4, color=(0.2, 0.6, 1.0)):
    plt = _plt()
    ax = ax or plt.gca()
    mask = np.asarray(mask).astype(bool)
    overlay = np.zeros(mask.shape + (4,))
    overlay[mask] = (*color, alpha)
    ax.imshow(overlay)
    return ax


def show_detection(image=None, contours=None, boxes=None, scores=None, locations=None,
                   classes=None, class_names=None, figsize=(16, 9),
                   contour_linestyle='-', ax=None, **kwargs):
    """Image + contours + boxes + scores in one figure.

    Parity: ``celldetection/visualization/images.py:205`` — ``classes`` (per
    detection: int ids or ready strings) and ``class_names`` (id → name dict,
    e.g. ``data.CLASS_NAMES_GEOMETRIC``) annotate each contour with
    ``"<score> <class>"`` like the reference's ``_score_texts``.
    """
    plt = _plt()
    if ax is None:
        plt.figure(figsize=figsize)
        ax = plt.gca()
    if image is not None:
        imshow(image, ax=ax)
    texts = kwargs.pop('texts', None)
    if texts is None and scores is not None and (classes is not None or class_names is not None):
        texts = []
        for i, s in enumerate(np.asarray(scores).reshape(-1)):
            label = f'{float(s):.2f}'
            if classes is not None:
                c = classes[i]
                if class_names is not None and not isinstance(c, str):
                    c = class_names.get(int(c), int(c))
                label = f'{label} {c}'
            texts.append(label)
    if contours is not None:
        plot_contours(contours, ax=ax, linestyle=contour_linestyle, texts=texts, **kwargs)
    if boxes is not None:
        plot_boxes(boxes, ax=ax)
    if scores is not None and locations is not None and texts is None:
        plot_score(scores, locations, ax=ax)
    return ax


def quiver_plot(field, ax=None, stride=8, **kwargs):
    """Vector-field quiver plot of an (h, w, 2) flow/refinement field."""
    plt = _plt()
    ax = ax or plt.gca()
    field = np.asarray(field)
    h, w = field.shape[:2]
    ys, xs = np.mgrid[0:h:stride, 0:w:stride]
    ax.quiver(xs, ys, field[::stride, ::stride, 0], field[::stride, ::stride, 1], **kwargs)
    return ax


def figure2img(fig, transparent=False) -> np.ndarray:
    """Matplotlib figure → RGBA array."""
    import io
    buf = io.BytesIO()
    fig.savefig(buf, format='png', transparent=transparent, bbox_inches='tight')
    buf.seek(0)
    from imageio.v2 import imread
    return np.asarray(imread(buf))


def save_fig(filename, fig=None, close=True, **kwargs):
    plt = _plt()
    fig = fig or plt.gcf()
    fig.savefig(filename, bbox_inches='tight', **kwargs)
    if close:
        plt.close(fig)


def imshow_col(*images, figsize=(9, 16), titles=None, **kwargs):
    """Images stacked vertically (parity: ``imshow_col``,
    ``celldetection/visualization/images.py:340``)."""
    plt = _plt()
    fig, axes = plt.subplots(len(images), 1, figsize=figsize)
    if len(images) == 1:
        axes = [axes]
    for i, (ax, im) in enumerate(zip(axes, images)):
        imshow(im, ax=ax, **kwargs)
        if titles:
            ax.set_title(titles[i])
    return fig


def get_axes(fig=None):
    """All axes of a figure (current figure by default — parity:
    ``get_axes``, ``celldetection/visualization/images.py:78``)."""
    plt = _plt()
    return (fig or plt.gcf()).get_axes()


def plot_zstack(stack, project=None, cols=4, titles=None, figsize=(16, 9), **kwargs):
    """Show a z-stack as a grid of slices, or as one projection.

    Parity: ``plot_zstack`` (``celldetection/visualization/images.py:365``).

    Args:
        stack: ``Array[z, h, w(, c)]``.
        project: Optional reduction over z ('max', 'mean', or callable).
        cols: Grid columns when showing all slices.
    """
    stack = np.asarray(stack)
    if project is not None:
        fn = {'max': np.max, 'mean': np.mean}.get(project, project)
        return imshow(fn(stack, axis=0), **kwargs)
    return imshow_grid(list(stack), cols=cols, figsize=figsize, **kwargs)


def plot_gif(*frames, fn=None, interval=200, **kwargs):
    """Animate frames; optionally save as GIF via ``fn`` (parity:
    ``plot_gif``, ``celldetection/visualization/images.py:395``)."""
    plt = _plt()
    from matplotlib import animation

    fig = plt.figure()
    ax = fig.add_subplot(1, 1, 1)
    ax.axis('off')
    ims = [[ax.imshow(np.asarray(f).squeeze(), animated=True, **kwargs)] for f in frames]
    ani = animation.ArtistAnimation(fig, ims, interval=interval, blit=True)
    if fn is not None:
        ani.save(fn, writer=animation.PillowWriter(fps=max(1, int(1000 / interval))))
    return ani
