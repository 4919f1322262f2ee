#!/usr/bin/env python
"""Offline ORB vocabulary training — the missing half of the reference's
vocabulary workflow.

The reference ships a pre-trained 140 MB `ORBvoc.txt` and only LOADS it
(reference: src/System.cc:78-94; the training tool lives outside the repo
in DBoW2). This framework self-trains online by default, but for the
reference's offline workflow — train once on representative imagery, reuse
across runs — this tool extracts ORB descriptors from a dataset and trains
either the flat MXU-matmul vocabulary (default) or the DBoW2-style k-ary
tree, saving to .npz (ours) or the reference's ORBvoc text format.

Usage:
  python examples/train_vocabulary.py <mode> <sequence_dir> <out.npz|out.txt>
      [--stride N] [--n-words W | --tree k L] [--features F] [--max-frames M]

  mode: tum-rgbd | tum-mono | kitti-mono | kitti-stereo | euroc-mono | euroc-stereo
  A .txt output path selects the reference's DBoW2 text format (tree only).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode")
    ap.add_argument("sequence_dir")
    ap.add_argument("out")
    ap.add_argument("--stride", type=int, default=10,
                    help="train on every Nth frame")
    ap.add_argument("--n-words", type=int, default=4096,
                    help="flat vocabulary size")
    ap.add_argument("--tree", nargs=2, type=int, metavar=("K", "L"),
                    help="train a k-ary depth-L tree instead (DBoW2 shape: 10 6)")
    ap.add_argument("--features", type=int, default=1000)
    ap.add_argument("--max-frames", type=int, default=200)
    args = ap.parse_args()

    import jax.numpy as jnp
    from orb_slam2_detailed_comments_tpu.frontend.tracking import Sensor  # noqa: F401
    from orb_slam2_detailed_comments_tpu.io.datasets import (
        TumRgbdDataset, KittiOdometryDataset, EurocDataset)
    from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
    from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig

    if args.mode.startswith("tum"):
        ds = TumRgbdDataset(args.sequence_dir)
    elif args.mode.startswith("kitti"):
        ds = KittiOdometryDataset(args.sequence_dir, stereo=False)
    elif args.mode.startswith("euroc"):
        ds = EurocDataset(args.sequence_dir, stereo=False)
    else:
        raise SystemExit(f"unknown mode {args.mode}")

    cap = 1 << int(np.ceil(np.log2(max(args.features, 2))))
    orb = OrbConfig(n_features=args.features, max_keypoints=cap)
    idxs = range(0, len(ds), args.stride)
    descs = []
    for n, i in enumerate(idxs):
        if n >= args.max_frames:
            break
        item = ds[i]
        img = item[1]
        kp = extract_orb(jnp.asarray(img, jnp.float32), orb)
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
        if n % 20 == 0:
            print(f"frame {i}: {sum(len(d) for d in descs)} descriptors", flush=True)
    train = np.concatenate(descs, axis=0)
    print(f"training on {len(train)} descriptors from {len(descs)} frames")

    if args.tree or args.out.endswith(".txt"):
        from orb_slam2_detailed_comments_tpu.place.vocabulary_tree import TreeVocabulary
        k, L = args.tree if args.tree else (10, 4)
        voc = TreeVocabulary.train(train, k=k, L=L)
        if args.out.endswith(".txt"):
            voc.save_dbow2_text(args.out)
        else:
            voc.save(args.out)
        print(f"tree vocabulary (k={k}, L={L}, {voc.n_words} words) -> {args.out}")
    else:
        from orb_slam2_detailed_comments_tpu.place.vocabulary import BinaryVocabulary
        voc = BinaryVocabulary.train(train, n_words=args.n_words)
        voc.save(args.out)
        print(f"flat vocabulary ({voc.n_words} words) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
