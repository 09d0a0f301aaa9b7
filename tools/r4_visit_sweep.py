#!/usr/bin/env python
"""Round-4 microbenchmark: where does a visit_scan pass actually spend time?

Sweeps precision x cluster-size x visit-count on the real chip with the bench
scene's realistic visit distribution (from the actual frustum culling on
primary and randomized bounce rays). If highest ~= high ~= default, the
kernel is VPU/loop-bound, not MXU-pass-bound, and the optimization target is
candidate count / decode ops, not matmul precision.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import tiled
from lumenrenderer_tpu.accel.stream import build_clusters
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
N = W * H


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tmin = jnp.float32(1e-3)
    tmax = jnp.full((N,), 1e8, jnp.float32)

    # synth bounce rays: random dirs from primary-ish hit points
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)

    print(f"tris={sc.num_triangles}", file=sys.stderr)

    for K in (256, 128, 64):
        cs = build_clusters(sc.tri_pos, cluster_size=K)
        print(f"--- K={K} C={cs.num_clusters} "
              f"feat={cs.tri_feat.size * 4 / 1e6:.1f}MB", file=sys.stderr)
        for mv in (12, 24):
            if mv > cs.num_clusters:
                mv = cs.num_clusters
            for prec in ("float32", "high", "bfloat16"):
                f = jax.jit(lambda o, d, tx, _cs=cs, _mv=mv, _p=prec:
                            tiled.intersect_closest(
                                _cs, o, d, tmin, tx, max_visits=_mv,
                                candidate_dtype=_p, use_pallas=True,
                                decode=False))
                ms_p, outp = timeit(f, ray_o, ray_d, tmax)
                # bounce origins from primary hits
                bo = ray_o + jnp.where(jnp.isfinite(outp["t"]),
                                       outp["t"], 1.0)[:, None] * ray_d
                ms_b, outb = timeit(f, bo, bd, tmax)
                fo = jax.jit(lambda o, d, tx, _cs=cs, _mv=mv, _p=prec:
                             tiled.intersect_any(
                                 _cs, o, d, tmin, tx, max_visits=_mv,
                                 candidate_dtype=_p, use_pallas=True))
                ms_o, _ = timeit(fo, bo, bd, tmax)
                print(f"K={K:4d} mv={mv:3d} {prec:9s} "
                      f"primary={ms_p:8.2f} bounce={ms_b:8.2f} "
                      f"occl={ms_o:8.2f} ovf_p={bool(outp['overflow'])} "
                      f"ovf_b={bool(outb['overflow'])}", flush=True)


if __name__ == "__main__":
    main()
