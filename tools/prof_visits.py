#!/usr/bin/env python
"""Visit-count statistics for the tile culling at bench shapes (CPU, numpy).

How many clusters does a 128-ray tile's frustum really admit, for scanline
vs swizzled tiles, primary vs bounce rays, across cluster sizes? This bounds
what the Pallas kernel can possibly achieve.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

W = int(os.environ.get("BENCH_W", 2560))
H = int(os.environ.get("BENCH_H", 1440))
N = W * H
RT = 128


def tile_visits(lo, hi, o, d, tmax):
    """Per-tile conservative frustum test (same math as tiled._frustum_visits).
    Returns per-tile admitted-cluster counts."""
    tiles = o.shape[0] // RT
    ot = o.reshape(tiles, RT, 3)
    dt = d.reshape(tiles, RT, 3)
    olo, ohi = ot.min(1), ot.max(1)
    dlo, dhi = dt.min(1), dt.max(1)
    t_cap = tmax.reshape(tiles, RT).max(1)
    eps = 1e-20
    inv_a = 1.0 / np.where(np.abs(dlo) > eps, dlo, eps)
    inv_b = 1.0 / np.where(np.abs(dhi) > eps, dhi, eps)
    zero_in_d = (dlo <= 0.0) & (dhi >= 0.0)
    counts = np.zeros(tiles, np.int32)
    tnear_all = []
    B = 2048
    for s in range(0, tiles, B):
        sl = slice(s, min(s + B, tiles))
        nmin = lo[None] - ohi[sl, None]
        nmax = hi[None] - olo[sl, None]
        c1 = nmin * inv_a[sl, None]
        c2 = nmin * inv_b[sl, None]
        c3 = nmax * inv_a[sl, None]
        c4 = nmax * inv_b[sl, None]
        ent = np.minimum(np.minimum(c1, c2), np.minimum(c3, c4))
        exi = np.maximum(np.maximum(c1, c2), np.maximum(c3, c4))
        ent = np.where(zero_in_d[sl, None], -np.inf, ent)
        exi = np.where(zero_in_d[sl, None], np.inf, exi)
        tn = ent.max(-1)
        tf = exi.min(-1)
        hit = (tn <= tf) & (tf >= 0.0) & (tn <= t_cap[sl, None])
        counts[sl] = hit.sum(1)
    return counts


def per_ray_exact(lo, hi, o, d, tmax):
    """Exact per-ray slab admitted counts (lower bound on culling quality)."""
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)
    counts = np.zeros(o.shape[0], np.int32)
    B = 65536
    for s in range(0, o.shape[0], B):
        sl = slice(s, min(s + B, o.shape[0]))
        t0 = (lo[None] - o[sl, None]) * inv[sl, None]
        t1 = (hi[None] - o[sl, None]) * inv[sl, None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tn <= tf) & (tf >= 0) & (tn <= tmax[sl, None])
        counts[sl] = hit.sum(1)
    return counts


def main():
    import jax
    import jax.numpy as jnp

    from lumenrenderer_tpu.accel import stream
    from lumenrenderer_tpu.core import camera as camera_mod
    from lumenrenderer_tpu.scene import presets

    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    print(f"scene: {sc.num_triangles} tris")

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random"
    )
    o = np.asarray(ray_o)
    d = np.asarray(ray_d)
    tmax = np.full(N, 1e8, np.float32)

    perm, inv = camera_mod.block_swizzle_map(W, H)
    osw, dsw = o[perm], d[perm]

    rng = np.random.default_rng(1)
    bd = rng.normal(size=(N, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
    bo = o + d  # roughly on-surface origins

    for K in (64, 128, 256):
        cs = stream.build_clusters(sc.tri_pos, cluster_size=K)
        lo, hi = np.asarray(cs.aabb_lo), np.asarray(cs.aabb_hi)
        C = lo.shape[0]
        v_scan = tile_visits(lo, hi, o, d, tmax)
        v_swiz = tile_visits(lo, hi, osw, dsw, tmax)
        v_bounce = tile_visits(lo, hi, bo, bd, tmax)
        r_exact = per_ray_exact(lo, hi, o[::37], d[::37], tmax[::37])
        print(
            f"K={K:4d} C={C:4d} | primary scanline mean={v_scan.mean():6.1f} "
            f"p95={np.percentile(v_scan, 95):5.0f} | swizzle mean="
            f"{v_swiz.mean():6.1f} p95={np.percentile(v_swiz, 95):5.0f} | "
            f"bounce mean={v_bounce.mean():6.1f} | per-ray exact mean="
            f"{r_exact.mean():5.1f}"
        )


if __name__ == "__main__":
    main()
