#!/usr/bin/env python
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from lumenrenderer_tpu.accel import pairs as pairs_mod
from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.accel.tiled import RAY_TILE, _frustum_visits
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
key = jax.random.PRNGKey(0)
ray_o, ray_d = camera_mod.generate_primary_rays(cam, W, H, jnp.int32(0), key=key, jitter="random")
tmin = jnp.float32(1e-3)
tmax = jnp.full((N,), 1e8, jnp.float32)
lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
cs128 = stream.build_clusters(sc.tri_pos, cluster_size=128)
isect0, _ = tiled.tiled_intersectors(cs128, max_visits=128, use_pallas=True, candidate_dtype="high", decode=False)
hits = jax.jit(lambda o, d, tx: isect0(o, d, tmin, tx))(ray_o, ray_d, tmax)
bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
lk = jax.random.fold_in(key, 7)
lpos = jax.random.uniform(lk, (N, 3)) * 16 + 2
lpos = lpos.at[:, 1].set(jax.random.uniform(jax.random.fold_in(lk, 1), (N,)) * 7 + 12)
sdir = lpos - bo
dist = jnp.linalg.norm(sdir, axis=-1)
sdirn = sdir / dist[:, None]
stx = dist - 2e-3

def stats(name, K, o, d, tx, capsule=False):
    cs = stream.build_clusters(sc.tri_pos, cluster_size=K)
    c = cs.num_clusters
    mv = min(128, c)
    if capsule:
        okey = sorting_mod.shadow_sort_key(o, o + d * tx[:, None], lo, hi) if hasattr(sorting_mod, 'shadow_sort_key') else sorting_mod.ray_sort_key(o, d, lo, hi)
    else:
        okey = sorting_mod.ray_sort_key(o, d, lo, hi)
    order = jnp.argsort(okey)
    o, d, tx = o[order], d[order], tx[order]
    tiles = N // RAY_TILE
    tn = jnp.full((N,), 1e-3, jnp.float32)
    @jax.jit
    def go(o, d, tx):
        sel, valid, _tn, ovf = _frustum_visits(cs, o, d, tn, tx, tiles, mv)
        hit = pairs_mod._refine_hits(cs, o, d, tn, tx, sel.astype(jnp.int32), valid, tiles)  # (T,128,mv)
        per_ray = hit.sum(-1).mean()
        h = hit.reshape(tiles, 8, 16, mv)
        u16 = h.any(2).sum(-1)            # (T,8)
        u8 = hit.reshape(tiles, 16, 8, mv).any(2).sum(-1)
        u32 = hit.reshape(tiles, 4, 32, mv).any(2).sum(-1)
        u128 = hit.any(1).sum(-1)
        return per_ray, u8.mean(), jnp.percentile(u16.astype(jnp.float32), 99), u16.mean(), u16.max(), u32.mean(), u128.mean(), ovf
    pr, m8, p99_16, m16, mx16, m32, m128, ovf = go(o, d, tx)
    print(f"{name:28s} K={K:3d} C={c:4d} per-ray={float(pr):5.2f} u8={float(m8):5.2f} u16={float(m16):5.2f} (p99={float(p99_16):.0f} max={int(mx16)}) u32={float(m32):5.2f} u128={float(m128):5.2f} ovf={bool(ovf)}", flush=True)

for K in (64, 128):
    stats("bounce sorted", K, bo, bd, tmax)
    stats("shadow sorted(dir)", K, bo, sdirn, stx)
print("primary (unsorted):", flush=True)
for K in (64, 128):
    stats("primary raw", K, ray_o, ray_d, tmax)
