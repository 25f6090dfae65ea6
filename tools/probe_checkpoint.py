#!/usr/bin/env python3
"""Quick behavioral probe of an FFN checkpoint on the phantom.

Reports, for FOVs seeded at cell centers and near membranes: the filled
fraction, same-cell purity, and whether face-max moves would cross
membranes — the quantities that predict flood-fill behavior before paying
for a full segmentation run.

Usage: python tools/probe_checkpoint.py <ckpt.npz|tf1-prefix> [depth]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    from scipy.special import expit, logit

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tools import synthetic_em
    from ffn_tpu.inference import runner as runner_lib
    from ffn_tpu.models import convstack_3d

    ckpt = sys.argv[1]
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    params = runner_lib.load_model_params(ckpt)
    model = convstack_3d.ConvStack3DFFNModel(
        fov_size=[33, 33, 33], deltas=[8, 8, 8], depth=depth, features=32,
        precision=None)
    apply = jax.jit(model.apply)

    image_u8, gt = synthetic_em.make_volume(size=100, num_cells=8, seed=2)
    image = (image_u8.astype(np.float32) - 128) / 33

    positions = []
    for cid in range(1, 9):
        zz, yy, xx = np.where(gt == cid)
        if len(zz) == 0:
            continue
        positions.append(tuple(int(np.clip(v.mean(), 17, 82))
                               for v in (zz, yy, xx)))
    from scipy import ndimage
    dark = image_u8 < 100
    near = ndimage.binary_dilation(dark, iterations=4) & ~dark
    cand = np.argwhere(near)
    cand = cand[(cand.min(axis=1) > 20) & (cand.max(axis=1) < 80)]
    n_center = len(positions)
    for i in range(16 - n_center):
        positions.append(tuple(cand[i * 40]))

    patches = np.stack([image[z - 16:z + 17, y - 16:y + 17, x - 16:x + 17]
                        for z, y, x in positions])[..., None]
    seed = np.full((len(positions), 33, 33, 33, 1),
                   np.float32(logit(0.05)))
    seed[:, 16, 16, 16, 0] = logit(0.95)
    out = np.asarray(apply(params, jnp.asarray(patches),
                           jnp.asarray(seed)))
    prob = expit(out[..., 0])

    def face_crossings(p, gpatch, cell):
        center = np.array([16, 16, 16])
        sub = [slice(c - 8, c + 9) for c in center]
        crossings = moves = 0
        for axis in range(3):
            for off in (-8, 8):
                fsel = list(sub)
                fsel[axis] = center[axis] + off
                face_p = p[tuple(fsel)]
                face_g = gpatch[tuple(fsel)]
                if face_p.max() >= 0.9:
                    moves += 1
                    idx = np.unravel_index(face_p.argmax(), face_p.shape)
                    if face_g[idx] != cell:
                        crossings += 1
        return crossings, moves

    stats = {"center": [], "memb": []}
    cross = move = 0
    for i, (z, y, x) in enumerate(positions):
        gpatch = gt[z - 16:z + 17, y - 16:y + 17, x - 16:x + 17]
        cell = gt[z, y, x]
        m = prob[i] >= 0.6
        purity = (gpatch[m] == cell).mean() if m.sum() else -1.0
        tag = "center" if i < n_center else "memb"
        stats[tag].append((float(m.mean()), float(purity)))
        c_, m_ = face_crossings(prob[i], gpatch, cell)
        cross += c_
        move += m_

    for tag, rows in stats.items():
        if not rows:
            continue
        fills, purities = zip(*rows)
        print(f"{tag}: fill {np.mean(fills):.3f} "
              f"purity {np.mean(purities):.3f} (n={len(rows)})")
    print(f"face-max moves: {move}, membrane crossings: {cross}")


if __name__ == "__main__":
    main()
