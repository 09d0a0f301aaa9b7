#!/usr/bin/env python
"""Sweep (cluster_size, max_visits) for the tiled/Pallas intersector at the
bench shapes — closest (coherent + incoherent) and occlusion timings."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

W = int(os.environ.get("BENCH_W", 2560))
H = int(os.environ.get("BENCH_H", 1440))
N = W * H
REPS = int(os.environ.get("REPS", 3))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:52s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    from lumenrenderer_tpu.accel import stream, tiled
    from lumenrenderer_tpu.core import camera as camera_mod
    from lumenrenderer_tpu.scene import presets

    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    print(f"scene: {sc.num_triangles} tris, device={jax.devices()[0]}", flush=True)

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random"
    )
    ray_o, ray_d = jax.block_until_ready((ray_o, ray_d))
    tmin = jnp.float32(1e-3)
    tmax_b = jnp.full((N,), 1e8, jnp.float32)

    # incoherent bounce-like rays
    ku = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)

    configs = [
        (int(c), int(m), cull)
        for spec in os.environ.get(
            "SWEEP", "256:12:frustum,32:32:frustum,32:16:frustum,64:16:frustum"
        ).split(",")
        for c, m, cull in [spec.split(":")]
    ]
    for cs_k, mv, cull in configs:
        cs = stream.build_clusters(sc.tri_pos, cluster_size=cs_k)
        isect, occl = tiled.tiled_intersectors(
            cs, max_visits=mv, use_pallas=True, culling=cull
        )
        j_isect = jax.jit(lambda o, d, tx, f=isect: f(o, d, tmin, tx))
        j_occl = jax.jit(lambda o, d, tx, f=occl: f(o, d, tmin, tx))
        tag = f"K={cs_k} mv={mv} {cull} C={cs.num_clusters}"
        t1 = timeit(f"[{tag}] closest coherent", j_isect, ray_o, ray_d, tmax_b)
        hits = jax.block_until_ready(j_isect(ray_o, ray_d, tmax_b))
        bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
        bo = jax.block_until_ready(bo)
        t2 = timeit(f"[{tag}] closest incoherent", j_isect, bo, bd, tmax_b)
        t3 = timeit(f"[{tag}] occlusion incoherent", j_occl, bo, bd, tmax_b)
        print(f"[{tag}] frame-share est: {t1 + 4 * t2 + 5 * t3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
