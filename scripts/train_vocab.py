"""Train an ORB vocabulary from diverse synthetic textures.

The reference ships a pre-trained 1M-word ORBvoc (Vocabulary/); our BRIEF
pattern differs, so we train our own. Default target is a production-scale
k=10, L=5 (~100k-word) tree — the sparse keyframe database
(map/keyframe_db.py) keeps memory O(K * words-per-KF) regardless of
vocabulary size, so large vocabularies are free at query time.

Descriptors come from a mix of block textures, multi-scale noise blobs,
warped variants, and ray-traced room renders (io/synth.py) so the tree sees
both synthetic-benchmark and generic-texture statistics.

Usage: python scripts/train_vocab.py [out.npz] [--k 10] [--levels 5]
       [--scenes 240] [--features 3000]
"""
import argparse
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from orbslam2_tpu.config import OrbParams
from orbslam2_tpu.ops.features import extract_orb
from orbslam2_tpu.io.vocabulary import train_vocabulary


def gather_descriptors(n_scenes: int, n_features: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    params = OrbParams(n_features=n_features)
    descs = []
    from scipy.ndimage import gaussian_filter
    from orbslam2_tpu.io import synth

    room = None
    for trial in range(n_scenes):
        mode = trial % 5
        if mode == 0:  # block texture
            cell = rng.integers(4, 16)
            img = np.kron(rng.uniform(0, 255, (480 // cell + 1, 640 // cell + 1)),
                          np.ones((cell, cell)))[:480, :640]
        elif mode == 1:  # smooth blobs
            img = rng.uniform(0, 255, (30, 40))
            img = np.kron(img, np.ones((16, 16)))
            img = gaussian_filter(img, rng.uniform(1, 4))
        elif mode == 2:  # mixed-scale squares
            img = np.full((480, 640), 128.0)
            for _ in range(rng.integers(100, 300)):
                s = rng.integers(2, 20)
                y, x = rng.integers(0, 480 - s), rng.integers(0, 640 - s)
                img[y:y + s, x:x + s] = rng.uniform(0, 255)
        elif mode == 3:  # binary noise
            img = (rng.random((120, 160)) > 0.5) * 255.0
            img = np.kron(img, np.ones((4, 4)))
        else:  # ray-traced room views (the e2e scenes' texture statistics)
            if trial % 40 == 4 or room is None:
                room = synth.make_room(seed=int(rng.integers(1 << 30)))
            ang = rng.uniform(0, 2 * np.pi)
            c, s = np.cos(ang), np.sin(ang)
            R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
            T = np.hstack([R, t[:, None]]).astype(np.float32)
            img = synth.render_room(room, T, seed=int(rng.integers(1 << 30)))
        img = img + rng.normal(0, 2, img.shape)
        f = extract_orb(jnp.asarray(np.clip(img, 0, 255).astype(np.float32)),
                        params, 480, 640)
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.desc)[v])
        if trial % 20 == 0:
            print(f"scene {trial}/{n_scenes}: {v.sum()} descs "
                  f"(total {sum(len(d) for d in descs)})", flush=True)
    return np.concatenate(descs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="orbslam2_tpu/data/vocab_default.npz")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--scenes", type=int, default=240)
    ap.add_argument("--features", type=int, default=3000)
    ap.add_argument("--max-train", type=int, default=800_000)
    args = ap.parse_args()

    t0 = time.time()
    all_desc = gather_descriptors(args.scenes, args.features)
    print(f"total descriptors: {len(all_desc)} ({time.time() - t0:.0f}s)")
    t0 = time.time()
    voc = train_vocabulary(all_desc, k=args.k, levels=args.levels, seed=0,
                           max_train=args.max_train)
    print(f"trained in {time.time() - t0:.0f}s")
    voc.save(args.out)
    print("saved", args.out, "words:", voc.n_words)


if __name__ == "__main__":
    main()
