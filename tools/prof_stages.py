#!/usr/bin/env python
"""Per-stage frame-time breakdown at the bench config (VERDICT r1 item 1).

Times each wavefront stage in isolation, jitted, at 2560x1440 depth-5 shapes
on the live device, then the full frame — so the sum can be compared with the
whole to find unattributed cost.
"""
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
REPS = int(os.environ.get("REPS", 5))


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:44s} {dt:9.2f} ms")
    return dt


def main():
    from lumenrenderer_tpu.accel import stream, tiled
    from lumenrenderer_tpu.bsdf import disney
    from lumenrenderer_tpu.core import camera as camera_mod
    from lumenrenderer_tpu.integrator import nee as nee_mod
    from lumenrenderer_tpu.integrator.surface import extract_surface_data
    from lumenrenderer_tpu.integrator.wavefront import RenderConfig
    from lumenrenderer_tpu.render.renderer import Renderer
    from lumenrenderer_tpu.scene import presets

    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    print(f"scene: {sc.num_triangles} tris, device={jax.devices()[0]}")

    cluster = int(os.environ.get("BENCH_CLUSTER", 256))
    mv = int(os.environ.get("BENCH_MV", 12))
    cs = stream.build_clusters(sc.tri_pos, cluster_size=cluster)
    isect, occl = tiled.tiled_intersectors(
        cs, max_visits=mv, use_pallas=jax.default_backend() == "tpu"
    )

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random"
    )
    ray_o, ray_d = jax.block_until_ready((ray_o, ray_d))
    tmin = jnp.float32(1e-3)
    tmax_b = jnp.full((N,), 1e8, jnp.float32)

    j_isect = jax.jit(lambda o, d, tx: isect(o, d, tmin, tx))
    j_occl = jax.jit(lambda o, d, tx: occl(o, d, tmin, tx))

    t_int = timeit("closest intersect (primary, coherent)", j_isect, ray_o, ray_d, tmax_b)
    hits = jax.block_until_ready(j_isect(ray_o, ray_d, tmax_b))

    # incoherent bounce-like rays: random directions from hit points
    ku = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    bo, bd = jax.block_until_ready((bo, bd))
    t_int2 = timeit("closest intersect (bounce, incoherent)", j_isect, bo, bd, tmax_b)
    t_occ = timeit("occlusion (shadow, incoherent)", j_occl, bo, bd, tmax_b)

    j_ext = jax.jit(
        lambda o, d, h: extract_surface_data(sc, o, d, h["t"], h["tri"], h["u"], h["v"])
    )
    t_ext = timeit("extract_surface_data", j_ext, ray_o, ray_d, hits)
    sd = jax.block_until_ready(j_ext(ray_o, ray_d, hits))

    wo = -ray_d
    u4 = jax.random.uniform(jax.random.PRNGKey(2), (N, 4))
    j_eval = jax.jit(lambda s, a, b: disney.evaluate(sc.materials, s, a, b))
    j_samp = jax.jit(lambda s, a, u, k: disney.sample(sc.materials, s, a, u, k))
    t_eval = timeit("disney evaluate", j_eval, sd, wo, bd)
    t_samp = timeit("disney sample", j_samp, sd, wo, u4, key)

    ltab = jax.jit(nee_mod.build_light_table, static_argnames=("selection",))(
        sc, selection="cdf"
    )
    u3 = jax.random.uniform(jax.random.PRNGKey(3), (N, 3))
    j_nee = jax.jit(lambda u, p: nee_mod.sample_light(ltab, u, p))
    t_nee = timeit("nee sample_light", j_nee, u3, sd.position)

    j_prim = jax.jit(
        lambda fi, k: camera_mod.generate_primary_rays(cam, W, H, fi, key=k, jitter="random")
    )
    t_prim = timeit("generate_primary_rays", j_prim, jnp.int32(0), key)

    depth = 5
    est = (
        t_int + (depth - 1) * t_int2          # closest per depth
        + depth * t_occ                        # NEE shadow per depth
        + depth * (t_ext + t_eval + t_nee)     # extract+NEE eval per depth
        + (depth - 1) * t_samp                 # bounce sample
        + t_prim
    )
    print(f"{'— naive depth-5 frame estimate':44s} {est:9.2f} ms")

    cfg = RenderConfig(width=W, height=H, max_depth=depth, bsdf="disney",
                       light_strategy="mis")
    r = Renderer(sc, cfg, accel="tiled", cluster_size=cluster, max_visits=mv)
    st = r.init_state(0)
    st, _ = r.render_frame(st, cam)  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        st, _ = r.render_frame(st, cam)
    jax.block_until_ready(st.accum)
    t_frame = (time.perf_counter() - t0) / reps * 1e3
    print(f"{'FULL FRAME (mis, depth 5)':44s} {t_frame:9.2f} ms")


if __name__ == "__main__":
    main()
