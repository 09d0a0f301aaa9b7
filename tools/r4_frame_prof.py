#!/usr/bin/env python
"""Round-4 frame profiler: time each REAL frame component at bench shapes,
including the sorted wrappers, partition, and culling, with the Renderer's
actual intersectors."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import tiled
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H


def timeit(name, fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms",
          flush=True)
    return out


def main():
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    cfg = RenderConfig(width=W, height=H, max_depth=5, bsdf="disney",
                       light_strategy="mis")
    r = Renderer(sc, cfg, accel="tiled")
    print(f"C={r.clusters.num_clusters} K={r.clusters.tris_per_cluster}",
          flush=True)

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tmin = jnp.float32(1e-3)
    tmax = jnp.full((N,), 1e8, jnp.float32)

    j_isect = jax.jit(lambda o, d, tx: r._isect(o, d, tmin, tx))
    j_occl = jax.jit(lambda o, d, tx: r._occl(o, d, tmin, tx))
    hits = timeit("primary isect (raw)", j_isect, ray_o, ray_d, tmax)

    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)

    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    s_isect, s_occl = sorting_mod.sorted_intersectors(
        r._isect, r._occl, lo, hi)
    js_isect = jax.jit(lambda o, d, tx: s_isect(o, d, tmin, tx))
    js_occl = jax.jit(lambda o, d, tx: s_occl(o, d, tmin, tx))

    timeit("bounce isect (raw, unsorted)", j_isect, bo, bd, tmax)
    timeit("bounce isect (global sort)", js_isect, bo, bd, tmax)

    # later-depth realism: 50% dead lanes
    alive = jax.random.uniform(jax.random.fold_in(key, 9), (N,)) < 0.5
    tmax_half = jnp.where(alive, 1e8, -1.0)
    timeit("bounce isect (sorted, 50% dead)", js_isect, bo, bd, tmax_half)

    # shadow to random lights
    lk = jax.random.fold_in(key, 7)
    lpos = jax.random.uniform(lk, (N, 3)) * 16 + 2
    lpos = lpos.at[:, 1].set(
        jax.random.uniform(jax.random.fold_in(lk, 1), (N,)) * 7 + 12)
    sdir = lpos - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3
    timeit("shadow occl (raw, unsorted)", j_occl, bo, sdir, stx)
    timeit("shadow occl (global sort)", js_occl, bo, sdir, stx)
    stx_half = jnp.where(alive, stx, -1.0)
    timeit("shadow occl (sorted, 50% dead)", js_occl, bo, sdir, stx_half)

    from lumenrenderer_tpu.integrator.surface import extract_surface_data
    from lumenrenderer_tpu.integrator import nee as nee_mod
    j_ext = jax.jit(lambda o, d, hh: extract_surface_data(
        sc, o, d, hh["t"], hh["tri"], hh["u"], hh["v"]))
    timeit("extract_surface_data", j_ext, ray_o, ray_d, hits)
    ltab = jax.jit(nee_mod.build_light_table, static_argnames=("selection",))(
        sc, selection="cdf")
    u3 = jax.random.uniform(jax.random.fold_in(key, 3), (N, 3))
    sd0 = j_ext(ray_o, ray_d, hits)
    timeit("nee sample_light", jax.jit(
        lambda u, p: nee_mod.sample_light(ltab, u, p)), u3, sd0.position)

    # culling alone at the renderer's mv
    mv = min(r.clusters.num_clusters, 128)
    cull = jax.jit(lambda o, d, tx: tiled._frustum_visits(
        r.clusters, o, d, jnp.full((N,), 1e-3, jnp.float32), tx,
        N // 128, mv))
    timeit(f"frustum culling mv={mv}", cull, bo, bd, tmax)

    # full frame for reference
    st = r.init_state(0)
    st, _ = r.render_frame(st, cam)
    t0 = time.perf_counter()
    for _ in range(3):
        st, _ = r.render_frame(st, cam)
    jax.block_until_ready(st.accum)
    print(f"{'FULL FRAME':42s} {(time.perf_counter() - t0) / 3 * 1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
