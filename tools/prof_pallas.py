import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import time
import jax, jax.numpy as jnp, numpy as np
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

scene, camf = presets.interior_scene(n_boxes=100, n_lights=64)
sc, cam = scene.build(), camf(320/180)
R = 320*180
o, d = generate_primary_rays(cam, 320, 180, jnp.uint32(0), jitter="center")
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
def timeit(name, f, n=8):
    r=f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r=f()
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)
    return r
rx = timeit("closest xla   ", lambda: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=12))
rp = timeit("closest pallas", lambda: tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=12, use_pallas=True))
timeit("any xla   ", lambda: tiled.intersect_any(cs, o, d, 1e-3, 1e9, max_visits=12))
timeit("any pallas", lambda: tiled.intersect_any(cs, o, d, 1e-3, 1e9, max_visits=12, use_pallas=True))
a,b = np.asarray(rx["tri"]), np.asarray(rp["tri"])
tie = np.isclose(np.asarray(rx["t"]), np.asarray(rp["t"]), rtol=1e-4)
print("tpu agreement:", ((a==b)|tie).mean())
