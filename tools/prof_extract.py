"""Isolate surface-extract cost: gather vs math at bench scale."""
import time
import jax, jax.numpy as jnp
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.integrator import surface
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
R = W * H
o, d = generate_primary_rays(cam, W, H, jnp.uint32(0), jitter="center")
cs = stream.build_clusters(sc.tri_pos, cluster_size=256)
hits = tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=12, use_pallas=True)
jax.block_until_ready(hits["t"])


def timeit(name, f, n=4):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return r


att = jax.jit(surface._attr_table)(sc)
jax.block_until_ready(att)
print("attr table:", att.shape, att.nbytes / 1e6, "MB", flush=True)
tri = jnp.maximum(hits["tri"], 0)

gf = jax.jit(lambda t: att[t]); timeit("row gather (R,%d)" % att.shape[1], lambda: gf(tri))
gt = jax.jit(lambda t: jnp.take(att, t, axis=0)); timeit("row gather take", lambda: gt(tri))
# padded to 128 lanes?
attp = jnp.pad(att, ((0, 0), (0, 128 - att.shape[1] % 128)))
gp = jax.jit(lambda t: attp[t]); timeit("row gather padded128", lambda: gp(tri))
# gather of a (N,8) table
att8 = att[:, :8]
g8 = jax.jit(lambda t: att8[t]); timeit("row gather (R,8)", lambda: g8(tri))
# full extract
ext = jax.jit(lambda h: surface.extract_surface_data(
    sc, o, d, h["t"], h["tri"], h["u"], h["v"]))
timeit("full extract", lambda: ext(hits))

# --- bisect extract ---
from lumenrenderer_tpu.core import vecmath as vm

def part_gather(h):
    tri = jnp.maximum(h["tri"], 0)
    a = surface._attr_table(sc)[tri]
    return a

def part_interp(h):
    tri = jnp.maximum(h["tri"], 0)
    a = surface._attr_table(sc)[tri]
    w = (1.0 - h["u"] - h["v"])[:, None]; u_ = h["u"][:, None]; v_ = h["v"][:, None]
    nrm3 = a[:, 3:12].reshape(-1, 3, 3)
    uv3 = a[:, 12:18].reshape(-1, 3, 2)
    tan3 = a[:, 18:30].reshape(-1, 3, 4)
    normal = vm.normalize(w * nrm3[:, 0] + u_ * nrm3[:, 1] + v_ * nrm3[:, 2])
    uv = w * uv3[:, 0] + u_ * uv3[:, 1] + v_ * uv3[:, 2]
    tangent = vm.normalize(w * tan3[:, 0, :3] + u_ * tan3[:, 1, :3] + v_ * tan3[:, 2, :3])
    return normal, uv, tangent

def part_trimat(h):
    tri = jnp.maximum(h["tri"], 0)
    return sc.tri_mat[tri]

pg = jax.jit(part_gather); timeit("extract: gather", lambda: pg(hits))
pi = jax.jit(part_interp); timeit("extract: gather+interp", lambda: pi(hits))
pm = jax.jit(part_trimat); timeit("extract: tri_mat gather", lambda: pm(hits))
print("textures count:", sc.textures.count, flush=True)

# --- additive bisect: progressively fuller extract ---
from lumenrenderer_tpu.scene.materials import GatheredMaterial

def upto_orient(h):
    normal, uv, tangent = part_interp(h)
    tri = jnp.maximum(h["tri"], 0)
    a = surface._attr_table(sc)[tri]
    geo_normal = a[:, 0:3]
    front_face = vm.dot(geo_normal, -d) >= 0.0
    flip = jnp.where(front_face, 1.0, -1.0)
    geo_normal = geo_normal * flip[..., None]
    normal = jnp.where(vm.dot(normal, geo_normal)[..., None] < 0.0, -normal, normal)
    return normal, geo_normal, uv, tangent

def upto_mat(h):
    normal, geo_normal, uv, tangent = upto_orient(h)
    tri = jnp.maximum(h["tri"], 0)
    a = surface._attr_table(sc)[tri]
    mw = sc.materials.packed().shape[1]
    rows = a[:, 30:30 + mw]
    g = GatheredMaterial(rows)
    mode = a[:, 30 + mw]
    override = a[:, 31 + mw:34 + mw]
    emissive = jnp.where((mode == 2.0)[..., None], override, g.emissive)
    emissive = jnp.where((mode == 0.0)[..., None], 0.0, emissive)
    return normal, geo_normal, uv, g.base_color, emissive, g.roughness, g.metallic

def interp_cols(h):
    tri = jnp.maximum(h["tri"], 0)
    a = surface._attr_table(sc)[tri]
    w = (1.0 - h["u"] - h["v"])[:, None]; u_ = h["u"][:, None]; v_ = h["v"][:, None]
    normal = vm.normalize(w * a[:, 3:6] + u_ * a[:, 6:9] + v_ * a[:, 9:12])
    uv = w * a[:, 12:14] + u_ * a[:, 14:16] + v_ * a[:, 16:18]
    tangent = vm.normalize(w * a[:, 18:21] + u_ * a[:, 22:25] + v_ * a[:, 26:29])
    return normal, uv, tangent

uo = jax.jit(upto_orient); timeit("extract: +orient", lambda: uo(hits))
um = jax.jit(upto_mat); timeit("extract: +mats", lambda: um(hits))
ic = jax.jit(interp_cols); timeit("extract: interp-cols (no rank3)", lambda: ic(hits))
