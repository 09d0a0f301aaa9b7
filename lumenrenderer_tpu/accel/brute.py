"""Brute-force ray/triangle intersector (validation reference).

Equivalent role to the reference's OptiX trace for correctness: this is the
ground-truth intersector the LBVH traversal is tested against (the reference
has no such oracle — OptiX *is* its oracle). Möller–Trumbore over all
triangles, chunked with `lax.map` to bound memory; fine for test scenes,
replaced by `accel.traverse` for real workloads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import vecmath as vm

#: Invalid-hit sentinel for triangle ids (≙ the reference's 0xFFFFFFFF
#: primitive-id convention in `IntersectionData.h`).
NO_HIT = jnp.int32(-1)


def moller_trumbore(o, d, p0, e1, e2, backface_cull: bool = False):
    """Vectorized Möller–Trumbore. o,d: (...,3); p0,e1,e2: (...,3).

    Returns (t, u, v, hit_mask). Misses get t = +inf.
    """
    pvec = jnp.cross(d, e2)
    det = vm.dot(e1, pvec)
    if backface_cull:
        det_ok = det > 1e-9
    else:
        det_ok = jnp.abs(det) > 1e-9
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = o - p0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    hit = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    return jnp.where(hit, t, jnp.inf), u, v, hit


@partial(jax.jit, static_argnames=("chunk",))
def intersect_closest(tri_pos, origins, dirs, t_min, t_max, chunk: int = 4096):
    """Closest-hit query for a batch of rays against all triangles.

    tri_pos: (T,3,3); origins/dirs: (R,3); t_min/t_max scalars or (R,).
    Returns dict(t (R,), tri (R,), u (R,), v (R,)) — tri = -1 on miss.
    """
    p0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - tri_pos[:, 0]
    e2 = tri_pos[:, 2] - tri_pos[:, 0]
    r = origins.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def ray_chunk(args):
        o, d, tmin, tmax = args  # (c,3),(c,3),(c,),(c,)
        t, u, v, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], p0[None], e1[None], e2[None]
        )  # (c,T)
        t = jnp.where((t >= tmin[:, None]) & (t <= tmax[:, None]), t, jnp.inf)
        best = jnp.argmin(t, axis=1)
        bt = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        bu = jnp.take_along_axis(u, best[:, None], axis=1)[:, 0]
        bv = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
        tri = jnp.where(jnp.isfinite(bt), best.astype(jnp.int32), NO_HIT)
        return bt, tri, bu, bv

    pad = (-r) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    tn = jnp.pad(t_min, (0, pad))
    tx = jnp.pad(t_max, (0, pad))
    nchunk = o.shape[0] // chunk
    rs = lambda a: a.reshape(nchunk, chunk, *a.shape[1:])
    t, tri, u, v = jax.lax.map(ray_chunk, (rs(o), rs(d), rs(tn), rs(tx)))
    flat = lambda a: a.reshape(-1)[:r]
    return {"t": flat(t), "tri": flat(tri), "u": flat(u), "v": flat(v)}


@partial(jax.jit, static_argnames=("chunk",))
def intersect_any(tri_pos, origins, dirs, t_min, t_max, chunk: int = 4096):
    """Any-hit (occlusion) query: True where the segment [t_min,t_max] is
    blocked. ≙ the reference's shadow-ray any-hit path
    (`Shaders/WaveFrontShaders.cu:114-179`)."""
    res = intersect_closest(tri_pos, origins, dirs, t_min, t_max, chunk=chunk)
    return res["tri"] >= 0
