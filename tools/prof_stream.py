import time
import jax, jax.numpy as jnp, numpy as np
from lumenrenderer_tpu.accel import stream
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

scene, camf = presets.interior_scene(n_boxes=100, n_lights=64)
sc, cam = scene.build(), camf(320/180)
R = 320*180
o, d = generate_primary_rays(cam, 320, 180, jnp.uint32(0), jitter="center")

def timeit(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/n
    print(f"{name}: {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mray/s)")

for K in (64, 128, 256):
    cs = stream.build_clusters(sc.tri_pos, cluster_size=K)
    print("K", K, "C", cs.num_clusters)
    timeit(f"closest K{K}", lambda: stream.intersect_closest(cs, o, d, 1e-3, 1e9, max_pairs_per_ray=8))
    timeit(f"any     K{K}", lambda: stream.intersect_any(cs, o, d, 1e-3, 1e9, max_pairs_per_ray=8))
