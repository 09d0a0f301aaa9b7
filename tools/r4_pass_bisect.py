#!/usr/bin/env python
"""Bisect ONE sorted occlusion/closest pass: cumulative cost as stages are
added (barriers stop XLA from folding the pipeline)."""
import sys, time
from functools import partial
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import tiled
from lumenrenderer_tpu.accel.stream import build_clusters, ray_features
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.ops.pallas import intersect as pk
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H
RT = 128
KEY_MISS = 0x7F000000


def timeit(name, fn, *args, reps=4):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)


def main():
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    cs = build_clusters(sc.tri_pos, cluster_size=128)
    C = cs.num_clusters
    mv = min(C, 128)
    key = jax.random.PRNGKey(0)
    o, d = camera_mod.generate_primary_rays(cam, W, H, jnp.int32(0), key=key,
                                            jitter="random")
    tx0 = jnp.full((N,), 1e8, jnp.float32)
    isect0, _ = tiled.tiled_intersectors(cs, max_visits=mv, use_pallas=True,
                                         candidate_dtype="high", decode=False)
    hits = jax.jit(lambda: isect0(o, d, jnp.float32(1e-3), tx0))()
    bo = o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * d
    lk = jax.random.fold_in(key, 7)
    lcent = jax.random.uniform(lk, (64, 3)) * 16 + 2
    lcent = lcent.at[:, 1].set(
        jax.random.uniform(jax.random.fold_in(lk, 1), (64,)) * 7 + 12)
    pick = jax.random.randint(jax.random.fold_in(lk, 2), (N,), 0, 64)
    sdir = lcent[pick] - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    bar = jax.lax.optimization_barrier
    tn_s = jnp.float32(1e-3)

    def s1_sort(o_, d_, tx_):
        tnb = jnp.broadcast_to(tn_s, (N,))
        keyv = sorting_mod.capsule_sort_key(o_, d_, tx_, lo, hi)
        keyv = jnp.where(tx_ > tnb, keyv, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(keyv)
        packed = jnp.concatenate(
            [o_, d_, tnb[:, None], tx_[:, None]], axis=1)[order]
        return bar((order, packed))

    def s2_cull(packed):
        os_, ds_ = packed[:, 0:3], packed[:, 3:6]
        tns, txs = packed[:, 6], packed[:, 7]
        sel, val, tnear, ovf = tiled._frustum_visits(
            cs, os_, ds_, tns, txs, N // RT, mv)
        nv = jnp.sum(val, axis=1).astype(jnp.int32)
        tb = jax.lax.bitcast_convert_type(
            jnp.maximum(tnear, 0.0).astype(jnp.float32), jnp.int32)
        tnb = jnp.where(val, jnp.minimum(tb, KEY_MISS - 1),
                        jnp.int32(KEY_MISS))
        rf = ray_features(os_, ds_)
        rf_t = jnp.concatenate(
            [rf, tns[:, None], txs[:, None]], axis=1).reshape(N // RT, RT, 12)
        return bar((rf_t, sel.astype(jnp.int32), nv, tnb))

    k_bits = 7
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits

    def s3_kernel(rf_t, sel, nv, tnb):
        return bar(pk.visit_scan(
            rf_t, cs.tri_feat, cs.tri_id, sel, nv, tnb, k=128, mv=mv,
            k_bits=k_bits, low_bits=low_bits, closest=False))

    def s4_unsort(out, order):
        occ = out.reshape(-1)[:N] > 0
        inv = jnp.argsort(order)
        return occ[inv]

    timeit("occl s1 sort only", lambda: s1_sort(bo, sdir, stx))
    timeit("occl s1+s2 culling", lambda: s2_cull(s1_sort(bo, sdir, stx)[1]))
    timeit("occl s1+s2+s3 kernel",
           lambda: s3_kernel(*s2_cull(s1_sort(bo, sdir, stx)[1])))

    def full():
        order, packed = s1_sort(bo, sdir, stx)
        out = s3_kernel(*s2_cull(packed))
        return s4_unsort(out, order)
    timeit("occl s1..s4 full", full)


if __name__ == "__main__":
    main()
