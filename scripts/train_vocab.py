"""Train the default ORB vocabulary from diverse synthetic textures.

The reference ships a pre-trained 1M-word ORBvoc (Vocabulary/); our BRIEF
pattern differs, so we train our own default (k=10, L=4 ~ 10k words) over a
mix of block textures, multi-scale noise blobs, and warped variants.
Usage: python scripts/train_vocab.py [out.npz]
"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
from orbslam2_tpu.config import OrbParams
from orbslam2_tpu.ops.features import extract_orb
from orbslam2_tpu.io.vocabulary import train_vocabulary

rng = np.random.default_rng(0)
params = OrbParams(n_features=1500)
descs = []
for trial in range(40):
    mode = trial % 4
    if mode == 0:  # block texture
        cell = rng.integers(4, 16)
        img = np.kron(rng.uniform(0, 255, (480 // cell + 1, 640 // cell + 1)),
                      np.ones((cell, cell)))[:480, :640]
    elif mode == 1:  # smooth blobs
        img = rng.uniform(0, 255, (30, 40))
        img = np.kron(img, np.ones((16, 16)))
        from scipy.ndimage import gaussian_filter
        img = gaussian_filter(img, rng.uniform(1, 4))
    elif mode == 2:  # mixed-scale squares
        img = np.full((480, 640), 128.0)
        for _ in range(rng.integers(100, 300)):
            s = rng.integers(2, 20)
            y, x = rng.integers(0, 480 - s), rng.integers(0, 640 - s)
            img[y:y + s, x:x + s] = rng.uniform(0, 255)
    else:  # binary noise
        img = (rng.random((120, 160)) > 0.5) * 255.0
        img = np.kron(img, np.ones((4, 4)))
    img = img + rng.normal(0, 2, img.shape)
    f = extract_orb(jnp.asarray(np.clip(img, 0, 255).astype(np.float32)),
                    params, 480, 640)
    v = np.asarray(f.valid)
    descs.append(np.asarray(f.desc)[v])
    print(f"scene {trial}: {v.sum()} descs", flush=True)

all_desc = np.concatenate(descs)
print("total descriptors:", len(all_desc))
voc = train_vocabulary(all_desc, k=10, levels=4, seed=0)
out = sys.argv[1] if len(sys.argv) > 1 else "orbslam2_tpu/data/vocab_default.npz"
voc.save(out)
print("saved", out, "words:", voc.n_words)
