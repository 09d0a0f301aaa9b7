import time, functools
import jax, jax.numpy as jnp
from lumenrenderer_tpu.integrator.wavefront import RenderConfig, render_wavefront, merge_channels
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.core.camera import generate_primary_rays

scene, camf = presets.interior_scene(n_boxes=100, n_lights=64)
sc, cam = scene.build(), camf(320/180)
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
isect, occl = tiled.tiled_intersectors(cs, max_visits=12)

def frame_time(name, cfg, n=5):
    f = jax.jit(lambda k: merge_channels(render_wavefront(sc, isect, occl, cam, k, jnp.uint32(0), cfg)))
    k = jax.random.PRNGKey(0)
    r = f(k); jax.block_until_ready(r)
    t0=time.perf_counter()
    for i in range(n): r = f(jax.random.fold_in(k, i))
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

base = dict(width=320, height=180, max_depth=5, bsdf="disney", light_strategy="mis")
frame_time("full d5 disney mis", RenderConfig(**base))
frame_time("d1", RenderConfig(**{**base, "max_depth":1}))
frame_time("d2", RenderConfig(**{**base, "max_depth":2}))
frame_time("bsdf-only (no NEE/shadow)", RenderConfig(**{**base, "light_strategy":"bsdf"}))
frame_time("lambert mis", RenderConfig(**{**base, "bsdf":"lambert"}))
frame_time("nee (no MIS pdf)", RenderConfig(**{**base, "light_strategy":"nee"}))
