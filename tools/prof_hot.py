"""Profile the hot path at bench scale on the real chip."""
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


def timeit(name, f, n=3):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms ({R/dt/1e6:.2f} Mray/s)", flush=True)
    return r


cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
print("clusters:", cs.num_clusters, flush=True)
for dt_ in ("float32", "bfloat16"):
    res = timeit(f"closest mv16 {dt_}", lambda: tiled.intersect_closest(
        cs, o, d, 1e-3, 1e9, max_visits=16, candidate_dtype=dt_))
    print("   overflow:", bool(res["overflow"]), flush=True)
    timeit(f"any     mv16 {dt_}", lambda: tiled.intersect_any(
        cs, o, d, 1e-3, 1e9, max_visits=16, candidate_dtype=dt_))
try:
    timeit("closest mv16 pallas", lambda: tiled.intersect_closest(
        cs, o, d, 1e-3, 1e9, max_visits=16, use_pallas=True))
except Exception as e:
    print("pallas failed:", e, flush=True)

# how many visits do tiles actually need?
hit_rc, _ = tiled._ray_cluster_window(
    cs, o, d, jnp.full((R,), 1e-3), jnp.full((R,), 1e9))
hit_tc = jnp.any(hit_rc.reshape(R // 128, 128, cs.num_clusters), axis=1)
cnt = jnp.sum(hit_tc, axis=1)
import numpy as np
c = np.asarray(cnt)
print("visits/tile: mean", c.mean(), "p50", np.percentile(c, 50),
      "p90", np.percentile(c, 90), "p99", np.percentile(c, 99),
      "max", c.max(), flush=True)

# union visits at supertile granularities
for ST in (256, 512, 1024):
    hit_st = jnp.any(hit_rc.reshape(R // ST, ST, cs.num_clusters), axis=1)
    c2 = np.asarray(jnp.sum(hit_st, axis=1))
    print(f"supertile {ST}: mean {c2.mean():.2f} p90 {np.percentile(c2,90)} max {c2.max()}", flush=True)
