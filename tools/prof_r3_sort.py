#!/usr/bin/env python
"""Round-3 experiment: sorted vs unsorted incoherent intersection, cluster
size sweep, dead-lane behavior — at bench scale on the live device."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 2560 * 1440))
REPS = int(os.environ.get("REPS", 5))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt, out


def main():
    from lumenrenderer_tpu.accel import sorting, stream, tiled
    from lumenrenderer_tpu.core import camera as camera_mod
    from lumenrenderer_tpu.scene import presets

    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(2560 / 1440)
    print(f"scene: {sc.num_triangles} tris, device={jax.devices()[0]}")
    use_pallas = jax.default_backend() == "tpu"

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, 2560, 1440, jnp.int32(0), key=key, jitter="random"
    )
    tmin = jnp.float32(1e-3)
    tmax_b = jnp.full((N,), 1e8, jnp.float32)
    scene_lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    scene_hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)

    # incoherent bounce-like rays
    cs0 = stream.build_clusters(sc.tri_pos, cluster_size=256)
    isect0, _ = tiled.tiled_intersectors(cs0, max_visits=12,
                                         use_pallas=use_pallas)
    hits = jax.jit(lambda o, d, tx: isect0(o, d, tmin, tx))(
        ray_o, ray_d, tmax_b)
    ku = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"] - 1e-3, 1.0)[
        :, None] * ray_d
    bo, bd = jax.block_until_ready((bo, bd))

    # ~55% dead lanes (RR-killed), scattered: the depth>=3 situation
    dead = jax.random.uniform(jax.random.PRNGKey(2), (N,)) < 0.55
    tmax_half = jnp.where(dead, -1.0, 1e8)
    tmax_half = jax.block_until_ready(tmax_half)

    import ast
    configs = ast.literal_eval(
        os.environ.get("CFGS", "[(256,12),(128,24),(64,48)]")
    )
    full = os.environ.get("FULL", "0") == "1"
    for cluster, mv in configs:
        cs = stream.build_clusters(sc.tri_pos, cluster_size=cluster)
        isect, occl = tiled.tiled_intersectors(
            cs, max_visits=mv, use_pallas=use_pallas
        )
        s_isect, s_occl = sorting.sorted_intersectors(
            isect, occl, scene_lo, scene_hi
        )
        tag = f"K={cluster} mv={mv}"
        j1 = jax.jit(lambda o, d, tx, f=isect: f(o, d, tmin, tx))
        j2 = jax.jit(lambda o, d, tx, f=s_isect: f(o, d, tmin, tx))
        j3 = jax.jit(lambda o, d, tx, f=occl: f(o, d, tmin, tx))
        j4 = jax.jit(lambda o, d, tx, f=s_occl: f(o, d, tmin, tx))
        _, r2 = timeit(f"closest incoherent SORTED   {tag}", j2, bo, bd, tmax_b)
        timeit(f"occl    incoherent SORTED   {tag}", j4, bo, bd, tmax_b)
        timeit(f"closest 55%dead    SORTED   {tag}", j2, bo, bd, tmax_half)
        print(f"  overflow sorted={bool(r2['overflow'])}", flush=True)
        if full:
            _, r1 = timeit(f"closest incoherent unsorted {tag}", j1, bo, bd,
                           tmax_b)
            timeit(f"occl    incoherent unsorted {tag}", j3, bo, bd, tmax_b)
            match = float(
                jnp.mean((r1["tri"] == r2["tri"]).astype(jnp.float32))
            )
            print(f"  overflow unsorted={bool(r1['overflow'])} "
                  f"tri-match={match:.4f}", flush=True)


if __name__ == "__main__":
    main()
