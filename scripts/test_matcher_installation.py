#!/usr/bin/env python
"""Matcher sanity check (reference third_party/test_pdcnet_installation.py analog).

Renders two synthetic views, runs the configured matcher, writes a
visualization panel (matches + confidence) to scripts/test_matcher.png for
visual comparison.

  python scripts/test_matcher_installation.py [--backend zncc|pdcnet_jax]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="zncc")
    parser.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "test_matcher.png"))
    args = parser.parse_args()

    import numpy as np

    from sparf_tpu.datasets.synthetic import load_synthetic_scene
    from sparf_tpu.models import flow_net
    from sparf_tpu.utils import vis

    scene = load_synthetic_scene(split="train", H=120, W=160, n_train=3, n_test=1)
    combi = np.array([[0], [1]], np.int32)
    wrapper = flow_net.FlowSelectionWrapper(backend=args.backend, adapt_steps=200)
    corres, conf = wrapper.compute_flow_and_confidence_map_of_combi_list(scene, combi)

    img_t = scene["image"][0].transpose(1, 2, 0)
    img_s = scene["image"][1].transpose(1, 2, 0)
    mask = conf[0, 0] > 0.95
    ys, xs = np.where(mask)
    sel = np.random.RandomState(0).permutation(len(ys))[:80]
    kp_t = np.stack([xs[sel], ys[sel]], -1).astype(np.float32)
    kp_s = corres[0, :, ys[sel], xs[sel]]

    panel_matches = vis.plot_matches(img_t, img_s, kp_t, kp_s)
    panel_conf = vis.colorize(conf[0, 0], 0.0, 1.0, cmap="viridis")
    H = panel_matches.shape[0]
    import cv2

    panel_conf = cv2.resize(panel_conf, (int(panel_conf.shape[1] * H / panel_conf.shape[0]), H))
    panel = np.concatenate([panel_matches, panel_conf], axis=1)

    import imageio.v2 as imageio

    imageio.imwrite(args.out, (np.clip(panel, 0, 1) * 255).astype(np.uint8))
    n_conf = int(mask.sum())
    print(f"backend={args.backend}: {n_conf} confident matches; wrote {args.out}")
    if n_conf < 100:
        print("WARNING: very few confident matches — check the matcher setup")


if __name__ == "__main__":
    main()
