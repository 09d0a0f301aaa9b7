#!/usr/bin/env python
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from functools import partial
from lumenrenderer_tpu.accel import pairs as pairs_mod
from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.accel.tiled import RAY_TILE, _frustum_visits, _pad
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H

def timeit(name, fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms", flush=True)
    return out

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

# sort rays as sorted_intersectors would
okey = sorting_mod.ray_sort_key(bo, bd, lo, hi)
order = jnp.argsort(okey)
bo_s, bd_s = bo[order], bd[order]

K = 32
mpr = 6
cs = stream.build_clusters(sc.tri_pos, cluster_size=K)
c = cs.num_clusters
mv = min(128, c)
rp = N
tiles = rp // RAY_TILE
tn = jnp.full((N,), 1e-3, jnp.float32)

cull = jax.jit(lambda o, d: _frustum_visits(cs, o, d, tn, tmax, tiles, mv))
sel, valid, _tn2, ovf = timeit("cull (frustum mv=128)", cull, bo_s, bd_s)
sel = sel.astype(jnp.int32)

refine = jax.jit(lambda o, d: pairs_mod._refine_hits(cs, o, d, tn, tmax, sel, valid, tiles))
hit = timeit("refine (T,128,mv)", refine, bo_s, bd_s)
print("pairs/ray:", float(hit.sum()) / N, flush=True)

PAIR_GROUP = pairs_mod.PAIR_GROUP
p_cap = -(-(rp * mpr) // PAIR_GROUP) * PAIR_GROUP
s_cap = -(-(p_cap + c * RAY_TILE) // PAIR_GROUP) * PAIR_GROUP
emit = jax.jit(lambda h: pairs_mod._emit_sorted_pairs(h, sel, c, mv, p_cap, s_cap))
idx, dest_orig, pair_ray_s, tile_cluster, pov = timeit("emit_sorted_pairs", emit, hit)

from lumenrenderer_tpu.ops.pallas import pair_intersect as pk
from lumenrenderer_tpu.accel.stream import ray_features
k_bits = max((K - 1).bit_length(), 1)

def kern(o, d):
    rf = ray_features(o, d)
    rf12 = jnp.concatenate([rf, tn[:, None], tmax[:, None]], axis=1)
    dead_row = jnp.zeros((1, 12), jnp.float32).at[0, 10].set(1.0)
    rf12x = jnp.concatenate([rf12, dead_row], axis=0)
    rf_pairs = rf12x[jnp.minimum(pair_ray_s, rp)]
    return pk.pair_scan(rf_pairs, cs.tri_feat, tile_cluster, k=K, k_bits=k_bits, closest=True, interpret=False, precision="high")
out_s = timeit("gather rf + kernel", jax.jit(kern), bo_s, bd_s)

from lumenrenderer_tpu.ops.pallas.intersect import KEY_MISS
def reduce_(out_s):
    out_ext = jnp.concatenate([out_s, jnp.full((1,), KEY_MISS, jnp.int32)])
    out_orig = out_ext[jnp.minimum(dest_orig, s_cap)]
    n_slots = rp * mv
    slots = jnp.full((n_slots + 1,), KEY_MISS, jnp.int32).at[idx].set(out_orig, unique_indices=True)[:n_slots].reshape(rp, mv)
    return jnp.min(slots, axis=1)
timeit("reduction (slots scatter+min)", jax.jit(reduce_), out_s)
