import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import time, jax, jax.numpy as jnp
from lumenrenderer_tpu.integrator.wavefront import RenderConfig, render_wavefront, merge_channels
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.accel import stream, tiled

b, camf = presets.mega_scene(n_tris=1_000_000, n_lights=256)
sc = b.build()
cam = camf(640/360)
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
isect, occl = tiled.tiled_intersectors(cs, max_visits=16)

def frame_time(name, cfg, n=2):
    f = jax.jit(lambda k: merge_channels(render_wavefront(sc, isect, occl, cam, k, jnp.uint32(0), cfg)))
    k = jax.random.PRNGKey(0)
    r = f(k); jax.block_until_ready(r)
    t0=time.perf_counter()
    for i in range(n): r = f(jax.random.fold_in(k,i))
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.0f} ms", flush=True)

base = dict(width=640, height=360, bsdf="disney", swizzle=True, sort_secondary=True)
frame_time("d1 bsdf-only", RenderConfig(**base, max_depth=1, light_strategy="bsdf"))
frame_time("d1 mis      ", RenderConfig(**base, max_depth=1, light_strategy="mis"))
frame_time("d2 bsdf-only", RenderConfig(**base, max_depth=2, light_strategy="bsdf"))
frame_time("d3 bsdf-only", RenderConfig(**base, max_depth=3, light_strategy="bsdf"))
frame_time("d3 mis      ", RenderConfig(**base, max_depth=3, light_strategy="mis"))
