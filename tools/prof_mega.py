import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time, jax, jax.numpy as jnp, numpy as np
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays

b, camf = presets.mega_scene(n_tris=1_000_000, n_lights=256)
sc = b.build()
cam = camf(640/360)
print("tris", sc.num_triangles, flush=True)
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
print("clusters", cs.num_clusters, flush=True)
o, d = generate_primary_rays(cam, 640, 360, jnp.uint32(0), jitter="center")
def timeit(name, f, n=3):
    r=f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r=f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return r
for mv in (16, 32):
    r = timeit(f"mega closest tree mv={mv}", lambda mv=mv: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=mv, culling="tree"))
    print("  overflow:", bool(r["overflow"]), " hit rate:", float((np.asarray(r["tri"])>=0).mean()), flush=True)
# full frame
cfg = RenderConfig(width=640, height=360, max_depth=3, bsdf="disney", light_strategy="mis")
r = Renderer(sc, cfg, accel="tiled", cluster_size=128, max_visits=32)
st = r.init_state(0)
st,_ = r.render_frame(st, cam)
t0=time.perf_counter()
for _ in range(3): st,_ = r.render_frame(st, cam)
jax.block_until_ready(st.accum)
print(f"mega 640x360 d3 frame: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
