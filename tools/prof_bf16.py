import time
import jax, jax.numpy as jnp, numpy as np
from lumenrenderer_tpu.accel import stream, tiled, brute
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

scene, camf = presets.interior_scene(n_boxes=100, n_lights=64)
sc, cam = scene.build(), camf(320/180)
R = 320*180
o, d = generate_primary_rays(cam, 320, 180, jnp.uint32(0), jitter="center")
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
def timeit(name, f, n=5):
    r=f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r=f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return r
r32 = timeit("closest f32", lambda: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=12))
r16 = timeit("closest bf16", lambda: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=12, candidate_dtype="bfloat16"))
timeit("any f32 ", lambda: tiled.intersect_any(cs, o, d, 1e-3, 1e9, max_visits=12))
timeit("any bf16", lambda: tiled.intersect_any(cs, o, d, 1e-3, 1e9, max_visits=12, candidate_dtype="bfloat16"))
a, b = np.asarray(r32["tri"]), np.asarray(r16["tri"])
same = (a==b) | np.isclose(np.asarray(r32["t"]), np.asarray(r16["t"]), rtol=1e-3)
print("bf16 agreement:", same.mean())
