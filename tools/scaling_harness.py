#!/usr/bin/env python
"""Scaling-efficiency harness (round 4, VERDICT #8; BASELINE north star:
>=85% rays/s/chip efficiency at 1 chip / 1 host / 4 hosts).

Runs the progressive Renderer under meshes of size 1/2/4/8 (or what exists)
and prints rays/s/chip + efficiency vs the 1-device run as one JSON line per
mesh size. On a pod: run the same file on every host (it calls
parallel.distributed.initialize()). Locally: virtual CPU devices via
  SCALE_CPU=1 python tools/scaling_harness.py     (8 virtual devices)
On the real single chip this degenerates to size 1 (the tunnel has one
device) — the multi-chip numbers here are CPU-mesh relative efficiencies,
which exercise the identical GSPMD program a pod would run.

Env: SCALE_W/SCALE_H (default 1024x1024), SCALE_DEPTH (3), SCALE_FRAMES (4).
"""
import json
import os
import sys
import time

if os.environ.get("SCALE_CPU") == "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("SCALE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.parallel import distributed, shard
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets


def main() -> int:
    distributed.initialize()
    w = int(os.environ.get("SCALE_W", 1024))
    h = int(os.environ.get("SCALE_H", 1024))
    depth = int(os.environ.get("SCALE_DEPTH", 3))
    frames = int(os.environ.get("SCALE_FRAMES", 4))
    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, len(devs)) if s <= len(devs)]
    sizes = sorted(set(sizes))

    scene, camf = presets.interior_scene(n_boxes=150, n_lights=16)
    sc, cam = scene.build(), camf(w / h)
    cfg = RenderConfig(width=w, height=h, max_depth=depth, bsdf="disney",
                       light_strategy="mis")

    base_rps = None
    for n in sizes:
        mesh = shard.make_mesh(devs[:n]) if n > 1 else None
        r = Renderer(sc, cfg, accel="tiled", mesh=mesh)
        st = r.init_state(0)
        st, _ = r.render_frame(st, cam)  # compile+warm
        t0 = time.perf_counter()
        for _ in range(frames):
            st, _ = r.render_frame(st, cam)
        jax.block_until_ready(st.accum)
        dt = (time.perf_counter() - t0) / frames
        rps_chip = w * h / dt / n
        if base_rps is None:
            base_rps = rps_chip
        rec = {
            "mesh_size": n,
            "ms_per_frame": round(dt * 1e3, 2),
            "rays_per_s_per_chip": round(rps_chip),
            "efficiency_vs_1": round(rps_chip / base_rps, 3),
            "platform": jax.default_backend(),
            "w": w, "h": h, "depth": depth,
            "process_count": jax.process_count(),
        }
        if jax.default_backend() == "cpu":
            # virtual devices SHARE one host CPU: per-chip efficiency is
            # meaningless; flat ms_per_frame == perfect scaling here. Real
            # per-chip efficiency needs real chips (run this on a pod).
            rec["note"] = "cpu virtual mesh: judge ms_per_frame flatness"
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
