"""Match / epipolar-line visualisation (matplotlib, host side).

Capability parity with /root/reference/utils/common/plotting.py
(``plot_matches`` :252, ``plot_epilines`` and the tensor->rgb
undo-normalisation helpers): images are channels-last numpy here, so
the "undo" step reverses the ImageNet normalisation only.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from patch2pix_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD


def undo_normalize(im: np.ndarray) -> np.ndarray:
    """ImageNet-normalised HWC float -> displayable [0, 1] RGB."""
    return np.clip(np.asarray(im) * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)


def side_by_side(im1: np.ndarray, im2: np.ndarray) -> Tuple[np.ndarray, int]:
    """Concatenate two HWC images horizontally; returns (canvas, x-offset
    of the second image)."""
    h = max(im1.shape[0], im2.shape[0])
    w1, w2 = im1.shape[1], im2.shape[1]
    canvas = np.zeros((h, w1 + w2, 3), dtype=np.float64)
    canvas[: im1.shape[0], :w1] = im1
    canvas[: im2.shape[0], w1:] = im2
    return canvas, w1


def plot_matches(
    im1: np.ndarray,
    im2: np.ndarray,
    matches: np.ndarray,
    scores: Optional[np.ndarray] = None,
    max_draw: int = 200,
    lines: bool = True,
    save_path: Optional[str] = None,
    dpi: int = 100,
):
    """Draw correspondences across a side-by-side pair.

    im1/im2: HWC arrays in [0, 1] (use :func:`undo_normalize` first if
    normalised). matches: (N, 4) as (x1, y1, x2, y2).
    Returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    canvas, xoff = side_by_side(im1, im2)
    n = len(matches)
    if n > max_draw:
        sel = np.random.default_rng(0).choice(n, max_draw, replace=False)
        matches = matches[sel]
        scores = scores[sel] if scores is not None else None

    fig, ax = plt.subplots(figsize=(12, 6), dpi=dpi)
    ax.imshow(canvas)
    ax.axis("off")
    cmap = plt.get_cmap("hsv")
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(matches)):
        c = cmap(i / max(len(matches), 1))
        ax.plot(x1, y1, "o", markersize=3, color=c)
        ax.plot(x2 + xoff, y2, "o", markersize=3, color=c)
        if lines:
            ax.plot([x1, x2 + xoff], [y1, y2], "-", linewidth=0.6, color=c)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_epilines(
    im1: np.ndarray,
    im2: np.ndarray,
    matches: np.ndarray,
    F: np.ndarray,
    max_draw: int = 30,
    save_path: Optional[str] = None,
):
    """Draw points in image 1 and their epipolar lines (F x1) in image 2."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(matches)
    if n > max_draw:
        sel = np.random.default_rng(0).choice(n, max_draw, replace=False)
        matches = matches[sel]

    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    axes[0].imshow(im1)
    axes[1].imshow(im2)
    for ax in axes:
        ax.axis("off")
    w2 = im2.shape[1]
    cmap = plt.get_cmap("hsv")
    for i, (x1, y1, x2, y2) in enumerate(np.asarray(matches)):
        c = cmap(i / max(len(matches), 1))
        axes[0].plot(x1, y1, "o", markersize=4, color=c)
        a, b, cc = F @ np.array([x1, y1, 1.0])
        if abs(b) > 1e-12:
            xs = np.array([0.0, w2])
            ys = -(a * xs + cc) / b
            axes[1].plot(xs, ys, "-", linewidth=0.8, color=c)
        axes[1].plot(x2, y2, "o", markersize=4, color=c)
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig
