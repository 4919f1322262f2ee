#!/usr/bin/env python
"""Train and ship the DEFAULT ORB vocabulary.

The reference always runs with a large offline-trained vocabulary
(reference: src/System.cc:78-94 loads ORBvoc.txt before anything else);
a vocabulary self-trained on the first keyframes of a run only covers the
start's appearance and quantizes the rest of a trajectory poorly. This
tool trains the shipped default (a k-ary tree, DBoW2's shape) on DIVERSE
rendered imagery — multiple synthetic worlds, textures and viewpoints —
and writes it to the package data directory, where System loads it by
default at construction.

Usage:  python examples/train_default_vocabulary.py [out.npz] [--k 10 --L 5]

Runs on CPU (set ORB_FORCE_CPU=1 to force when a TPU is attached).
"""
from __future__ import annotations

import argparse
import os
import sys

if os.environ.get("ORB_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))  # synthetic world renderers

import numpy as np

DEFAULT_OUT = os.path.join(
    _ROOT, "orb_slam2_detailed_comments_tpu", "data", "default_vocab.npz")


def gather_descriptors(features=600, verbose=True):
    import jax.numpy as jnp
    from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
    from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig
    from synthetic_world import (CylinderWorld, PlanesWorld, loop_trajectory,
                                 smooth_trajectory)

    orb = OrbConfig(n_features=features, max_keypoints=1024)
    descs = []

    def grab(img):
        kp = extract_orb(jnp.asarray(img, jnp.float32), orb)
        descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])

    # cylinder laps: six textures, outward yaw sweeps the full 360 deg
    for seed in range(6):
        world = CylinderWorld(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                              width=320, height=240, radius=8.0,
                              texture_seed=seed)
        for T in loop_trajectory(24, path_radius=4.0, overlap=0):
            grab(world.render(T))
        if verbose:
            print(f"cylinder seed {seed}: {sum(map(len, descs))} descriptors",
                  flush=True)

    # tilted-plane worlds: six textures, lateral sweeps
    for seed in range(10, 16):
        world = PlanesWorld(fx=250.0, fy=250.0, cx=160.0, cy=120.0,
                            width=320, height=240, texture_seed=seed)
        for T in smooth_trajectory(16, step=0.12, seed=seed):
            grab(world.render(T))
        if verbose:
            print(f"planes seed {seed}: {sum(map(len, descs))} descriptors",
                  flush=True)
    return np.concatenate(descs, axis=0)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default=DEFAULT_OUT)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=5)
    ap.add_argument("--features", type=int, default=1000)
    args = ap.parse_args()

    from orb_slam2_detailed_comments_tpu.place.vocabulary_tree import TreeVocabulary

    train = gather_descriptors(args.features)
    print(f"training k={args.k} L={args.L} on {len(train)} descriptors "
          f"({len(np.unique(train, axis=0))} unique)")
    voc = TreeVocabulary.train(train, k=args.k, L=args.L, seed=1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    voc.save(args.out)
    print(f"{voc.n_words} words -> {args.out} "
          f"({os.path.getsize(args.out) / 1024:.0f} KiB)")

    # quick discrimination report on a held-out world: same-view BoW score
    # must dominate different-view scores
    from synthetic_world import CylinderWorld, loop_trajectory
    import jax.numpy as jnp
    from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
    from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig
    orb = OrbConfig(n_features=600, max_keypoints=1024)
    world = CylinderWorld(fx=180.0, fy=180.0, cx=160.0, cy=120.0,
                          width=320, height=240, radius=8.0, texture_seed=99)
    poses = loop_trajectory(16, path_radius=4.0, overlap=0)
    bows = []
    for T in poses:
        kp = extract_orb(jnp.asarray(world.render(T)), orb)
        _, bow = voc.transform(np.asarray(kp.desc), np.asarray(kp.valid))
        bows.append(bow)
    same = [TreeVocabulary.score(bows[i], bows[(i + 1) % 16]) for i in range(16)]
    diff = [TreeVocabulary.score(bows[i], bows[(i + 8) % 16]) for i in range(16)]
    print(f"held-out lap: adjacent-view score {np.mean(same):.3f}, "
          f"opposite-view {np.mean(diff):.3f} "
          f"(ratio {np.mean(same) / max(np.mean(diff), 1e-6):.1f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
