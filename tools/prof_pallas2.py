"""Benchmark fused Pallas intersector vs XLA scan at bench scale."""
import time
import jax, jax.numpy as jnp
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
R = W * H
o, d = generate_primary_rays(cam, W, H, jnp.uint32(0), jitter="center")
print("tris:", sc.num_triangles, "device:", jax.devices()[0], flush=True)


def timeit(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mray/s)", flush=True)
    return r


for K, mv in ((32, 32), (64, 24), (128, 16)):
    cs = stream.build_clusters(sc.tri_pos, cluster_size=K)
    print(f"--- K={K} C={cs.num_clusters} mv={mv}", flush=True)
    res = timeit(f"pallas closest", lambda: tiled.intersect_closest(
        cs, o, d, 1e-3, 1e9, max_visits=mv, use_pallas=True))
    print("   overflow:", bool(res["overflow"]), flush=True)
    timeit(f"pallas any", lambda: tiled.intersect_any(
        cs, o, d, 1e-3, 2.0, max_visits=mv, use_pallas=True))
