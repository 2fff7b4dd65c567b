"""Self-supervised evaluation tools (reference transfer_em/debug.py).

* ``warp_tensor``: re-exported from ops.warp — manufactures an artificial
  source domain (blur + holes) from the target domain (debug.py:7-63).
* ``accuracy``: RMSE between unwarped ground truth and prediction
  (debug.py:65-71).
* ``generate_images``: side-by-side matplotlib display of the first z-slice
  of the first batch element (debug.py:73-102).
"""

from __future__ import annotations

import numpy as np

from .ops.losses import psnr, rmse
from .ops.warp import batch_warp, make_warp_map, warp

# parity aliases
warp_tensor = warp


def accuracy(unwarped_orig_tensor, predicted_tensor) -> float:
    """RMSE between ground truth and prediction (reference debug.py:65-71)."""
    return float(rmse(np.asarray(unwarped_orig_tensor),
                      np.asarray(predicted_tensor)))


def generate_images(orig, pred, show: bool = True, save_path: str | None = None):
    """Display/save input/output pair (reference debug.py:73-102).

    3D (rank-5) input: first z-slice of the first batch element.
    """
    # No matplotlib.use("Agg") here: plt.savefig works on ANY backend,
    # and mutating the process-global backend would silently break every
    # later interactive plt.show() in the same notebook (round-5 review).
    import matplotlib.pyplot as plt

    orig = np.asarray(orig)
    pred = np.asarray(pred)
    if orig.ndim == 5:
        orig = orig[0, 0, :, :, 0]
        pred = pred[0, 0, :, :, 0]
    else:
        orig = orig[0, :, :, 0]
        pred = pred[0, :, :, 0]

    fig = plt.figure(figsize=(12, 12))
    plt.subplot(121)
    plt.title("input")
    plt.imshow(orig * 0.5 + 0.5, cmap="gray", vmin=0, vmax=1)
    plt.axis("off")
    plt.subplot(122)
    plt.title("output")
    plt.imshow(pred * 0.5 + 0.5, cmap="gray", vmin=0, vmax=1)
    plt.axis("off")
    if save_path:
        plt.savefig(save_path)
    if show:
        plt.show()
    else:
        plt.close(fig)


__all__ = ["warp", "warp_tensor", "batch_warp", "make_warp_map", "accuracy",
           "generate_images", "rmse", "psnr"]
