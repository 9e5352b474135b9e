"""Novel-view video synthesis (reference nerf_trainer.py:487-571 + joint :664-705).

Renders a spiral/oscillation path with the trained model and writes mp4 via
cv2.VideoWriter (no os.system/ffmpeg dependency); falls back to GIF through
imageio when no mp4 codec is available.
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from sparf_tpu.models import renderer as renderer_mod
from sparf_tpu.utils import alignment, camera, rendering_paths, vis


def write_video(frames: List[np.ndarray], path: str, fps: int = 30) -> str:
    """frames: list of (H,W,3) float [0,1]. Writes mp4 (or .gif fallback)."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    H, W = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    if writer.isOpened():
        for f in frames:
            writer.write(cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                                      cv2.COLOR_RGB2BGR))
        writer.release()
        return path
    # GIF fallback
    import imageio.v2 as imageio

    gif_path = os.path.splitext(path)[0] + ".gif"
    imageio.mimsave(gif_path, [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames],
                    duration=1.0 / fps)
    return gif_path


def novel_view_poses_w2c(trainer, n_frames: int = 60) -> np.ndarray:
    """Pick the path family by dataset (LLFF spiral / DTU spiral / oscillation)."""
    dataset = trainer.cfg.get("dataset") or ""
    poses_w2c = np.asarray(trainer.current_poses_w2c())
    poses_c2w = alignment.invert_poses(poses_w2c)
    if "llff" in dataset:
        bounds = np.asarray(trainer.train_scene_np["depth_range"])
        c2w_path = rendering_paths.generate_spiral_path(poses_c2w, bounds, n_frames=n_frames)
        return alignment.invert_poses(c2w_path)
    if "dtu" in dataset:
        c2w_path = rendering_paths.generate_spiral_path_dtu(poses_c2w, n_frames=n_frames)
        return alignment.invert_poses(c2w_path)
    # oscillation around the central camera (replica/synthetic)
    anchor = poses_w2c[len(poses_w2c) // 2]
    return np.asarray(camera.get_novel_view_poses(jnp.asarray(anchor), N=n_frames))


def generate_videos_synthesis(trainer, out_dir: Optional[str] = None,
                              n_frames: int = 60, fps: int = 15) -> List[str]:
    """Render rgb+depth along the novel-view path; write videos."""
    out_dir = out_dir or os.path.join(trainer.workspace, "videos")
    os.makedirs(out_dir, exist_ok=True)
    H, W = trainer.train_scene_np["image"].shape[-2:]
    poses = novel_view_poses_w2c(trainer, n_frames)
    intr = trainer.train_scene["intr"][:1]
    depth_range = renderer_mod.render_depth_range(trainer.cfg, trainer.train_scene)
    fine_enabled = trainer.fine_enabled_at(trainer.iteration)

    rgb_frames, depth_frames = [], []
    for i in range(len(poses)):
        out = renderer_mod.render_image_chunked(
            trainer.state.nerf_params, trainer.render_cfg,
            jnp.asarray(poses[i : i + 1]), intr, H, W, depth_range,
            jnp.asarray(1.0), fine_enabled=fine_enabled,
            chunk=trainer.cfg.nerf.rand_rays, impl=trainer.mlp_impl,
        )
        key = "rgb_fine" if "rgb_fine" in out else "rgb"
        dkey = "depth_fine" if "depth_fine" in out else "depth"
        rgb_frames.append(np.asarray(out[key]).reshape(H, W, 3))
        depth_frames.append(vis.colorize(np.asarray(out[dkey]).reshape(H, W)))

    paths = [
        write_video(rgb_frames, os.path.join(out_dir, "rgb_novel_view.mp4"), fps),
        write_video(depth_frames, os.path.join(out_dir, "depth_novel_view.mp4"), fps),
    ]
    trainer.logger.info(f"wrote videos: {paths}")
    return paths


def generate_videos_pose(trainer, out_dir: Optional[str] = None, n_frames: int = 60,
                         fps: int = 10) -> Optional[str]:
    """Frusta-plot video of optimized-vs-GT poses over the optimization
    trajectory (joint_pose_nerf_trainer.py:664-705 analog).

    The trainer records poses at every val step into
    workspace/pose_history.npz (trainer.record_pose_history); the animation
    walks that history with axes pinned to the union bounding box so the
    camera cloud visibly converges onto GT. Falls back to a still of the
    final poses when no history exists (e.g. video-only on a foreign run)."""
    if not hasattr(trainer, "pose_cfg"):
        return None
    out_dir = out_dir or os.path.join(trainer.workspace, "videos")
    os.makedirs(out_dir, exist_ok=True)
    pose_gt = np.asarray(trainer.train_scene_np["pose"])

    entries = []
    hist_path = os.path.join(trainer.workspace, "pose_history.npz")
    if os.path.exists(hist_path):
        try:
            with np.load(hist_path) as z:
                entries = [(int(i), np.asarray(p)) for i, p in zip(z["iters"], z["poses"])]
        except Exception:
            entries = []
    entries.append((int(trainer.iteration), np.asarray(trainer.current_poses_w2c())))
    if len(entries) > n_frames:  # subsample evenly, always keeping first + last
        sel = np.unique(np.round(np.linspace(0, len(entries) - 1, n_frames)).astype(int))
        entries = [entries[i] for i in sel]

    # fixed axes across frames: union bbox of GT + every history entry
    centers = [alignment.invert_poses(pose_gt)[:, :3, 3]]
    centers += [alignment.invert_poses(p)[:, :3, 3] for _, p in entries]
    allc = np.concatenate(centers, axis=0)
    lo, hi = allc.min(0), allc.max(0)
    pad = 0.15 * (hi - lo).max() + 1e-3
    axlim = np.stack([lo - pad, hi + pad], axis=-1)

    frames = [
        vis.plot_camera_frusta(
            [("optimized", p, "tab:red"), ("GT", pose_gt, "tab:blue")],
            title=f"iter {it}", axlim=axlim,
        )
        for it, p in entries
    ]
    frames += [frames[-1]] * max(fps, 1)  # hold the converged state ~1s
    path = write_video(frames, os.path.join(out_dir, "poses.mp4"), fps)
    return path
