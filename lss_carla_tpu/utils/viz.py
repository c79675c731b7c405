"""Training/validation visualization — the reference's 3-row wandb figure.

Row 1: six camera views (min-max rescaled); row 2: BEV ground truth, sigmoid
prediction heatmap, and red/green/yellow GT-pred overlay — matching reference
``train_simbev.py:268-329``.
"""

from __future__ import annotations

import numpy as np

CAM_NAMES = ['FRONT_LEFT', 'FRONT', 'FRONT_RIGHT',
             'BACK_LEFT', 'BACK', 'BACK_RIGHT']


def make_bev_figure(cam_imgs: np.ndarray, gt: np.ndarray, pred_sigmoid:
                    np.ndarray, title: str = ""):
    """cam_imgs (N, 3, H, W) normalized; gt/pred (X, Y) in [0, 1]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = cam_imgs.shape[0]
    fig = plt.figure(figsize=(20, 12))
    for i in range(n):
        ax = plt.subplot(3, max(n, 1), i + 1)
        img = cam_imgs[i].transpose(1, 2, 0)
        img = (img - img.min()) / (img.max() - img.min() + 1e-8)
        ax.imshow(img)
        ax.set_title(CAM_NAMES[i] if i < len(CAM_NAMES) else f"CAM{i}",
                     fontsize=10, fontweight="bold")
        ax.axis("off")

    for k, (data, name) in enumerate(
            [(gt, "BEV Ground Truth"), (pred_sigmoid, "BEV Prediction")]):
        ax = plt.subplot(3, 3, 7 + k)
        ax.imshow(data, cmap="hot", vmin=0, vmax=1, origin="lower",
                  extent=[-50, 50, -50, 50])
        ax.set_title(name, fontsize=12, fontweight="bold")
        ax.set_xlabel("X (m)", fontsize=10)
        ax.set_ylabel("Y (m)", fontsize=10)
        ax.grid(True, alpha=0.3)

    ax = plt.subplot(3, 3, 9)
    overlay = np.zeros((*gt.shape, 3))
    overlay[..., 0] = gt
    overlay[..., 1] = pred_sigmoid
    ax.imshow(overlay, origin="lower", extent=[-50, 50, -50, 50])
    ax.set_title("Overlay (GT=Red, Pred=Green, Match=Yellow)", fontsize=12,
                 fontweight="bold")
    ax.set_xlabel("X (m)", fontsize=10)
    ax.set_ylabel("Y (m)", fontsize=10)
    ax.grid(True, alpha=0.3)

    if title:
        plt.suptitle(title, fontsize=14, fontweight="bold")
    plt.tight_layout()
    return fig
