#!/usr/bin/env python
"""Round-5 pair-admission lab: tiled (r4 production) vs pairs (r5) per pass
at bench shapes, across cluster size K and max_pairs_per_ray, with measured
admission (pairs/ray -> tris tested/ray)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import pairs as pairs_mod
from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H


def timeit(name, fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def admission(cs, o, d, tn, tx, mv):
    """Measured pairs/ray after per-ray refine (sorted rays assumed)."""
    rp = o.shape[0]
    tiles = rp // 128
    sel, valid, _t, ovf = tiled._frustum_visits(cs, o, d, tn, tx, tiles, mv)
    hit = pairs_mod._refine_hits(cs, o, d, tn, tx, sel.astype(jnp.int32),
                                 valid, tiles)
    alive = (tx >= tn).sum()
    return (hit.sum() / jnp.maximum(alive, 1), ovf)


def main():
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tmin = jnp.float32(1e-3)
    tmax = jnp.full((N,), 1e8, jnp.float32)
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)

    # bounce rays from primary hits (oracle: tiled K=128)
    cs128 = stream.build_clusters(sc.tri_pos, cluster_size=128)
    isect0, _ = tiled.tiled_intersectors(cs128, max_visits=128,
                                         use_pallas=True,
                                         candidate_dtype="high", decode=False)
    hits = jax.jit(lambda o, d, tx: isect0(o, d, tmin, tx))(
        ray_o, ray_d, tmax)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    alive = jax.random.uniform(jax.random.fold_in(key, 9), (N,)) < 0.5
    tmax_half = jnp.where(alive, 1e8, -1.0)
    lk = jax.random.fold_in(key, 7)
    lpos = jax.random.uniform(lk, (N, 3)) * 16 + 2
    lpos = lpos.at[:, 1].set(
        jax.random.uniform(jax.random.fold_in(lk, 1), (N,)) * 7 + 12)
    sdir = lpos - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3
    stx_half = jnp.where(alive, stx, -1.0)

    # ---- r4 production baseline (tiled K=128) ----
    print("== tiled K=128 (r4 production) ==", flush=True)
    ti, to = tiled.tiled_intersectors(cs128, max_visits=128, use_pallas=True,
                                      candidate_dtype="high", decode=False)
    s_ti, s_to = sorting_mod.sorted_intersectors(ti, to, lo, hi)
    jt = jax.jit(lambda o, d, tx: ti(o, d, tmin, tx))
    jst = jax.jit(lambda o, d, tx: s_ti(o, d, tmin, tx))
    jso = jax.jit(lambda o, d, tx: s_to(o, d, tmin, tx))
    timeit("tiled primary (raw)", jt, ray_o, ray_d, tmax)
    timeit("tiled bounce (sorted)", jst, bo, bd, tmax)
    timeit("tiled bounce (sorted, 50% dead)", jst, bo, bd, tmax_half)
    timeit("tiled shadow (capsule-sorted)", jso, bo, sdir, stx)
    timeit("tiled shadow (capsule-sorted, 50% dead)", jso, bo, sdir, stx_half)

    # ---- pairs across K ----
    for K in (32, 64, 128):
        for mpr in (6, 10):
            cs = cs128 if K == 128 else stream.build_clusters(
                sc.tri_pos, cluster_size=K)
            print(f"== pairs K={K} C={cs.num_clusters} mpr={mpr} ==",
                  flush=True)
            pi, po = pairs_mod.pair_intersectors(
                cs, max_visits=128, max_pairs_per_ray=mpr, precision="high",
                decode=False)
            s_pi, s_po = sorting_mod.sorted_intersectors(pi, po, lo, hi)
            jp = jax.jit(lambda o, d, tx: pi(o, d, tmin, tx))
            jsp = jax.jit(lambda o, d, tx: s_pi(o, d, tmin, tx))
            jspo = jax.jit(lambda o, d, tx: s_po(o, d, tmin, tx))
            r1 = timeit("pairs primary (raw)", jp, ray_o, ray_d, tmax)
            r2 = timeit("pairs bounce (sorted)", jsp, bo, bd, tmax)
            r3 = timeit("pairs bounce (sorted, 50% dead)", jsp, bo, bd,
                        tmax_half)
            r4 = timeit("pairs shadow (capsule-sorted)", jspo, bo, sdir, stx)
            r5 = timeit("pairs shadow (capsule, 50% dead)", jspo, bo, sdir,
                        stx_half)
            ovf = [bool(x["overflow"]) for x in (r1, r2, r3)]
            print(f"   overflow prim/bounce/bounce50: {ovf}", flush=True)
            if mpr == 6:
                # measured admission on sorted bounce rays
                okey = sorting_mod.ray_sort_key(bo, bd, lo, hi)
                order = jnp.argsort(okey)
                adm, _ = jax.jit(lambda o, d, tx: admission(
                    cs, o, d, jnp.full((N,), 1e-3, jnp.float32), tx,
                    min(cs.num_clusters, 128)))(bo[order], bd[order],
                                                tmax[order])
                print(f"   bounce pairs/ray={float(adm):.2f} "
                      f"tris/ray={float(adm) * K:.0f}", flush=True)


if __name__ == "__main__":
    main()
