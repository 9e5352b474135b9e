"""Visualization: depth/error colorization, image panels, pose-frusta plots.

Parity with reference source/utils/vis_rendering.py (colorize :49-103, panels
:291-330) and the camera-frusta matplotlib plots (:330-495). Everything is
host-side numpy/matplotlib producing HWC uint8/float arrays for TB logging.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def colorize(
    value: np.ndarray,
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    cmap: str = "jet",
    invalid_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(H,W) scalar map -> (H,W,3) float [0,1] colormapped."""
    import matplotlib.cm

    value = np.asarray(value, np.float32)
    if invalid_mask is None:
        invalid_mask = ~np.isfinite(value)
    valid = ~invalid_mask
    vmin = float(value[valid].min()) if vmin is None and valid.any() else (vmin or 0.0)
    vmax = float(value[valid].max()) if vmax is None and valid.any() else (vmax or 1.0)
    if vmax - vmin < 1e-10:
        vmax = vmin + 1e-10
    norm = np.clip((value - vmin) / (vmax - vmin), 0, 1)
    colored = matplotlib.cm.get_cmap(cmap)(norm)[..., :3].astype(np.float32)
    colored[invalid_mask] = 0.0
    return colored


def error_map(pred: np.ndarray, gt: np.ndarray, vmax: Optional[float] = None) -> np.ndarray:
    """Per-pixel L2 rgb error -> colormap."""
    err = np.linalg.norm(pred - gt, axis=-1)
    return colorize(err, vmin=0.0, vmax=vmax or max(float(err.max()), 1e-6), cmap="jet")


def make_image_grid(images: List[np.ndarray], ncol: Optional[int] = None) -> np.ndarray:
    """List of (H,W,3) float [0,1] -> one grid image (reference panel septych)."""
    ncol = ncol or len(images)
    H, W = images[0].shape[:2]
    imgs = [np.clip(np.asarray(im, np.float32), 0, 1) for im in images]
    rows = []
    for r in range(0, len(imgs), ncol):
        row = imgs[r : r + ncol]
        while len(row) < ncol:
            row.append(np.zeros((H, W, 3), np.float32))
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def render_panel(
    gt_rgb: np.ndarray,
    pred_rgb: np.ndarray,
    pred_depth: np.ndarray,
    opacity: Optional[np.ndarray] = None,
    depth_var: Optional[np.ndarray] = None,
    gt_depth: Optional[np.ndarray] = None,
    rgb_var: Optional[np.ndarray] = None,
    fine_row: Optional[dict] = None,
) -> np.ndarray:
    """Full septych (reference base.py:600-726): GT / render / error /
    [GT depth] / depth / opacity / [rgb_var] / [depth_var], with an optional
    second row for the fine head (the coarse-vs-fine debugging surface).

    `fine_row`: dict with pred_rgb, pred_depth and optionally opacity,
    depth_var, rgb_var of the fine samples."""
    vmin, vmax = None, None
    if gt_depth is not None:
        m = gt_depth > 0
        if m.any():
            vmin, vmax = float(gt_depth[m].min()), float(gt_depth[m].max())

    def row(pred_rgb, pred_depth, opacity=None, depth_var=None, rgb_var=None):
        imgs = [gt_rgb, pred_rgb, error_map(pred_rgb, gt_rgb)]
        if gt_depth is not None:
            imgs.append(colorize(gt_depth, vmin, vmax, invalid_mask=~(gt_depth > 0)))
        imgs.append(colorize(pred_depth, vmin, vmax))
        if opacity is not None:
            imgs.append(colorize(opacity, 0.0, 1.0, cmap="gray"))
        if rgb_var is not None:
            imgs.append(colorize(rgb_var, 0.0))
        if depth_var is not None:
            imgs.append(colorize(depth_var, 0.0))
        return imgs

    imgs = row(pred_rgb, pred_depth, opacity, depth_var, rgb_var)
    ncol = len(imgs)
    if fine_row is not None:
        extra = row(**fine_row)
        extra += [np.zeros_like(imgs[0])] * (ncol - len(extra))
        imgs += extra
    return make_image_grid(imgs, ncol=ncol)


def plot_camera_frusta(
    poses_w2c_list: List[Tuple[str, np.ndarray, str]],
    depth: float = 0.3,
    title: str = "",
    axlim: Optional[np.ndarray] = None,
) -> np.ndarray:
    """3D frusta plot -> (H,W,3) float image.

    poses_w2c_list: [(label, (N,3,4) w2c poses, matplotlib color)].
    axlim: optional (3,2) [(min,max) per axis] to pin the view across frames
    of an animation (pose-trajectory video holds axes fixed).
    (reference vis_rendering.py:330-495)
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sparf_tpu.utils import alignment

    fig = plt.figure(figsize=(6, 6), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    for label, poses_w2c, color in poses_w2c_list:
        c2w = alignment.invert_poses(np.asarray(poses_w2c))
        centers = c2w[:, :3, 3]
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], c=color, s=18, label=label)
        # frustum: 4 corners of a small image plane along +z
        corners = np.array(
            [[-0.5, -0.5, 1], [0.5, -0.5, 1], [0.5, 0.5, 1], [-0.5, 0.5, 1]]
        ) * depth
        for i in range(len(c2w)):
            R, t = c2w[i, :3, :3], c2w[i, :3, 3]
            pts = corners @ R.T + t
            for j in range(4):
                a, b = pts[j], pts[(j + 1) % 4]
                ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]], c=color, lw=0.5)
                ax.plot([t[0], pts[j][0]], [t[1], pts[j][1]], [t[2], pts[j][2]], c=color, lw=0.5)
    if axlim is not None:
        ax.set_xlim(axlim[0, 0], axlim[0, 1])
        ax.set_ylim(axlim[1, 0], axlim[1, 1])
        ax.set_zlim(axlim[2, 0], axlim[2, 1])
    ax.legend()
    if title:
        ax.set_title(title)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].astype(np.float32) / 255.0
    plt.close(fig)
    return buf


def plot_matches(
    img1: np.ndarray, img2: np.ndarray, kp1: np.ndarray, kp2: np.ndarray,
    max_matches: int = 100,
) -> np.ndarray:
    """Side-by-side match visualization (flow_net.py panels analog)."""
    import cv2

    H = max(img1.shape[0], img2.shape[0])
    W1, W2 = img1.shape[1], img2.shape[1]
    canvas = np.zeros((H, W1 + W2, 3), np.float32)
    canvas[: img1.shape[0], :W1] = img1
    canvas[: img2.shape[0], W1:] = img2
    canvas = (canvas * 255).astype(np.uint8).copy()
    sel = np.linspace(0, len(kp1) - 1, min(max_matches, len(kp1))).astype(int)
    for i in sel:
        p1 = (int(kp1[i, 0]), int(kp1[i, 1]))
        p2 = (int(kp2[i, 0]) + W1, int(kp2[i, 1]))
        color = tuple(int(c) for c in np.random.RandomState(i).randint(64, 255, 3))
        cv2.line(canvas, p1, p2, color, 1)
    return canvas.astype(np.float32) / 255.0
