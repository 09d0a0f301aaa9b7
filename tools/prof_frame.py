"""Stage breakdown of a full bench-scale frame on the real TPU."""
import time
import jax, jax.numpy as jnp
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.integrator import surface
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
R = W * H
print("tris:", sc.num_triangles, "device:", jax.devices()[0], flush=True)


def timeit(name, f, n=4):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return r


o, d = generate_primary_rays(cam, W, H, jnp.uint32(0), jitter="center")
cs = stream.build_clusters(sc.tri_pos, cluster_size=256)

hits = timeit("closest (primary)", lambda: tiled.intersect_closest(
    cs, o, d, 1e-3, 1e9, max_visits=12, use_pallas=True))
print("  hit rate:", float(jnp.mean(hits["tri"] >= 0)), "overflow:", bool(hits["overflow"]), flush=True)
timeit("any (shadow, len2)", lambda: tiled.intersect_any(
    cs, o, d, 1e-3, 2.0, max_visits=12, use_pallas=True))

ext = jax.jit(lambda h: surface.extract_surface_data(
    sc, o, d, h["t"], h["tri"], h["u"], h["v"]))
timeit("surface extract", lambda: ext(hits))

# full frame for reference
cfg = RenderConfig(width=W, height=H, max_depth=5, bsdf="disney",
                   light_strategy="mis")
r = Renderer(sc, cfg, accel="tiled", cluster_size=256, max_visits=12)
st = r.init_state(0)
st, _ = r.render_frame(st, cam)
timeit("full frame depth5", lambda: r.render_frame(st, cam)[0].accum, n=3)

cfg1 = RenderConfig(width=W, height=H, max_depth=1, bsdf="disney",
                    light_strategy="mis")
r1 = Renderer(sc, cfg1, accel="tiled", cluster_size=256, max_visits=12)
st1 = r1.init_state(0)
st1, _ = r1.render_frame(st1, cam)
timeit("full frame depth1", lambda: r1.render_frame(st1, cam)[0].accum, n=3)
