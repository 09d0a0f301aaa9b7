#!/usr/bin/env python
"""Round-5 ReSTIR per-pass timing (VERDICT #4): 512x512 bench-restir scene,
each pass jitted + timed in isolation on the real chip."""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.integrator import wavefront as wf
from lumenrenderer_tpu.integrator import surface as surface_mod
from lumenrenderer_tpu.restir import di
from lumenrenderer_tpu.scene import presets

W = H = 512
N = W * H

def timeit(name, fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / reps * 1e3:9.2f} ms", flush=True)
    return out

def main():
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=256)
    sc, cam = scene.build(), camf(1.0)
    cfg = wf.RenderConfig(width=W, height=H, max_depth=5, bsdf="disney",
                          light_strategy="nee", use_restir=True)
    rcfg = di.RestirConfig()
    cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
    isect, occl = tiled.tiled_intersectors(cs, max_visits=84, use_pallas=True,
                                           candidate_dtype="high", decode=False)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_mod.generate_primary_rays(cam, W, H, jnp.int32(0), key=key,
                                              jitter="random")
    tmin = jnp.float32(1e-3)
    tmax = jnp.full((N,), 1e8, jnp.float32)
    hits = jax.jit(lambda: isect(ro, rd, tmin, tmax))()
    sd = jax.jit(lambda: surface_mod.extract_surface_data(
        sc, ro, rd, hits["t"], hits["tri"], hits["u"], hits["v"]))()
    hit_mask = jnp.isfinite(hits["t"])
    wo = -rd
    motion = jnp.zeros((N, 2), jnp.float32)
    state = di.init_state(N)

    from lumenrenderer_tpu.integrator import nee as nee_mod
    rad_all = jax.jit(lambda: nee_mod.all_light_radiance(sc))()
    cdf, pdf = jax.jit(lambda: di.build_light_cdf(sc, rad_all))()
    timeit("build_light_cdf", jax.jit(lambda: di.build_light_cdf(sc, rad_all)[0]))
    bags = timeit("fill_light_bags", jax.jit(lambda: di.fill_light_bags(cdf, rcfg, key)))
    res0 = timeit("ris_primary (32 cand)", jax.jit(
        lambda: di.ris_primary(sc, sd, bags, pdf, rcfg, W, key, rad_all=rad_all)))
    res1 = timeit("visibility_pass", jax.jit(
        lambda: di.visibility_pass(sc, sd, res0, occl, hit_mask, rad_all=rad_all)))
    res2 = timeit("temporal_pass", jax.jit(
        lambda: di.temporal_pass(sc, sd, res1, state, motion, rcfg, W, H, key,
                                 rad_all=rad_all)))
    res3 = timeit("spatial_pass (2 it x 5)", jax.jit(
        lambda: di.spatial_pass(sc, sd, res2, hit_mask, rcfg, W, H, key,
                                rad_all=rad_all)))
    timeit("final visibility", jax.jit(
        lambda: di.visibility_pass(sc, sd, res3, occl, hit_mask, rad_all=rad_all)))
    eval_f = lambda s, o, i: wf._bsdf_eval(cfg, s, sc.materials, o, i)
    timeit("shade", jax.jit(
        lambda: di.shade(sc, sd, wo, res3, eval_f, hit_mask, rad_all=rad_all)))
    # whole __call__ for comparison
    rfn = di.RestirDI(occl, eval_f, rcfg, W, H)
    timeit("RestirDI.__call__ (all)", jax.jit(
        lambda: rfn(sc, sd, wo, hit_mask, motion, state, key)[0]))

if __name__ == "__main__":
    main()

def vis_sorted_probe():
    """Quick A/B: raw vs capsule-sorted occluder for the visibility pass."""
    import numpy as np
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=256)
    sc, cam = scene.build(), camf(1.0)
    cfg = wf.RenderConfig(width=W, height=H, max_depth=5, bsdf="disney",
                          light_strategy="nee", use_restir=True)
    rcfg = di.RestirConfig()
    cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
    isect, occl = tiled.tiled_intersectors(cs, max_visits=84, use_pallas=True,
                                           candidate_dtype="high", decode=False)
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    _, s_occl = sorting_mod.sorted_intersectors(isect, occl, lo, hi)
    key = jax.random.PRNGKey(0)
    ro, rd = camera_mod.generate_primary_rays(cam, W, H, jnp.int32(0), key=key,
                                              jitter="random")
    tmin = jnp.float32(1e-3)
    tmax = jnp.full((N,), 1e8, jnp.float32)
    hits = jax.jit(lambda: isect(ro, rd, tmin, tmax))()
    sd = jax.jit(lambda: surface_mod.extract_surface_data(
        sc, ro, rd, hits["t"], hits["tri"], hits["u"], hits["v"]))()
    hit_mask = jnp.isfinite(hits["t"])
    from lumenrenderer_tpu.integrator import nee as nee_mod
    rad_all = jax.jit(lambda: nee_mod.all_light_radiance(sc))()
    cdf, pdf = jax.jit(lambda: di.build_light_cdf(sc, rad_all))()
    bags = jax.jit(lambda: di.fill_light_bags(cdf, rcfg, key))()
    res0 = jax.jit(lambda: di.ris_primary(sc, sd, bags, pdf, rcfg, W, key,
                                          rad_all=rad_all))()
    a = timeit("visibility (raw occl)", jax.jit(
        lambda: di.visibility_pass(sc, sd, res0, occl, hit_mask, rad_all=rad_all)))
    b = timeit("visibility (capsule-sorted occl)", jax.jit(
        lambda: di.visibility_pass(sc, sd, res0, s_occl, hit_mask, rad_all=rad_all)))
    for f in ("w_out", "m"):
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)), atol=1e-5)
    print("sorted == raw results: ok", flush=True)

if __name__ == "__main__" and __import__("os").environ.get("VIS_PROBE"):
    vis_sorted_probe()
