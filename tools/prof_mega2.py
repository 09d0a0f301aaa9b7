import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time, jax, jax.numpy as jnp, numpy as np
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays, block_swizzle_map

b, camf = presets.mega_scene(n_tris=1_000_000, n_lights=256)
sc = b.build()
cam = camf(640/360)
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
print("clusters", cs.num_clusters, flush=True)
perm, inv = block_swizzle_map(640, 360)
pid = jnp.asarray(perm)
o, d = generate_primary_rays(cam, 640, 360, jnp.uint32(0), jitter="center", pixel_ids=pid)
def timeit(name, f, n=3):
    r=f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r=f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return r
for mv in (16, 32):
    r = timeit(f"swizzled closest tree mv={mv}", lambda mv=mv: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=mv, culling="tree"))
    print("  overflow:", bool(r["overflow"]), flush=True)
cfg = RenderConfig(width=640, height=360, max_depth=3, bsdf="disney", light_strategy="mis", swizzle=True, sort_secondary=True)
r = Renderer(sc, cfg, accel="tiled", cluster_size=128, max_visits=16)
st = r.init_state(0)
st,_ = r.render_frame(st, cam)
t0=time.perf_counter()
for _ in range(3): st,_ = r.render_frame(st, cam)
jax.block_until_ready(st.accum)
print(f"mega 640x360 d3 swizzled+sorted frame: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
