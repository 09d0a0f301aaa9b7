"""Independent numpy reference path tracer (test oracle).

Deliberately written as a *separate* implementation from the JAX framework:
plain vectorized numpy, recursive-style bounded loop, same light transport
(NEE / BSDF / MIS on Lambert surfaces + constant environment) so converged
images can be compared. This plays the role OptiX played for the reference —
an independent ground truth (SURVEY.md §4).
"""
from __future__ import annotations

import numpy as np


def _normalize(v, eps=1e-12):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), eps)


def intersect(tri_pos, o, d, t_min, t_max):
    """Brute-force Möller–Trumbore. o,d: (R,3). Returns t,tri,u,v arrays."""
    p0 = tri_pos[:, 0][None]  # (1,T,3)
    e1 = (tri_pos[:, 1] - tri_pos[:, 0])[None]
    e2 = (tri_pos[:, 2] - tri_pos[:, 0])[None]
    o = o[:, None]
    d = d[:, None]
    pvec = np.cross(d, e2)
    det = np.sum(e1 * pvec, -1)
    ok = np.abs(det) > 1e-9
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - p0
    u = np.sum(tvec * pvec, -1) * inv
    qvec = np.cross(tvec, e1)
    v = np.sum(d * qvec, -1) * inv
    t = np.sum(e2 * qvec, -1) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min[:, None]) & (t < t_max[:, None])
    t = np.where(hit, t, np.inf)
    best = np.argmin(t, axis=1)
    r = np.arange(o.shape[0])
    bt = t[r, best]
    return bt, np.where(np.isfinite(bt), best, -1), u[r, best], v[r, best]


def cosine_sample(n, rng):
    r = n.shape[0]
    u1, u2 = rng.random(r), rng.random(r)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack([rad * np.cos(phi), rad * np.sin(phi), np.sqrt(np.maximum(1 - u1, 0))], -1)
    # build ONB
    s = np.where(n[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = np.stack([1 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], -1)
    bt = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], -1)
    return local[:, :1] * t + local[:, 1:2] * bt + local[:, 2:3] * n


def render_reference(
    tri_pos,
    tri_mat,
    albedo,       # (M,3)
    emissive,     # (M,3)
    cam_o,        # (R,3) primary origins
    cam_d,        # (R,3) primary directions
    env=(0.0, 0.0, 0.0),
    max_depth=4,
    spp=64,
    strategy="mis",
    seed=0,
    light_tris=None,   # indices of emissive triangles; default: auto
):
    """Returns (R,3) mean radiance over spp."""
    rng = np.random.default_rng(seed)
    env = np.asarray(env, np.float64)
    tn = np.cross(tri_pos[:, 1] - tri_pos[:, 0], tri_pos[:, 2] - tri_pos[:, 0])
    tri_area = 0.5 * np.linalg.norm(tn, axis=-1)
    tri_n = tn / np.maximum(np.linalg.norm(tn, axis=-1, keepdims=True), 1e-20)
    em_lum = emissive[tri_mat].max(-1)
    if light_tris is None:
        light_tris = np.nonzero(em_lum > 0)[0]
    nl = len(light_tris)

    R = cam_o.shape[0]
    acc = np.zeros((R, 3))
    for s in range(spp):
        o = cam_o.copy()
        d = cam_d.copy()
        tp = np.ones((R, 3))
        out = np.zeros((R, 3))
        alive = np.ones(R, bool)
        prev_pdf = np.full(R, np.inf)
        for depth in range(max_depth):
            t, tri, _, _ = intersect(
                tri_pos, o, d, np.full(R, 1e-3), np.full(R, 1e9)
            )
            miss = alive & (tri < 0)
            out[miss] += tp[miss] * env
            hit = alive & (tri >= 0)
            trih = np.maximum(tri, 0)
            n = tri_n[trih]
            # face forward
            n = np.where((np.sum(n * d, -1) > 0)[:, None], -n, n)
            pos = o + t[:, None] * d
            mat = tri_mat[trih]
            em = emissive[mat]
            is_em = em.max(-1) > 0
            add_em = np.zeros(R, bool)
            if depth == 0 or strategy == "bsdf":
                add_em = hit & is_em
                w = np.ones(R)
            elif strategy == "mis":
                add_em = hit & is_em
                # light pdf for this hit
                row = trih
                cos_l = np.maximum(np.sum(tri_n[row] * (-d), -1), 0.0)
                pdf_a = (1.0 / max(nl, 1)) / np.maximum(tri_area[row], 1e-12)
                lpdf = pdf_a * t * t / np.maximum(cos_l, 1e-6)
                lpdf = np.where(cos_l > 1e-6, lpdf, 0.0)
                w = np.where(
                    np.isinf(prev_pdf),
                    1.0,
                    prev_pdf**2 / np.maximum(prev_pdf**2 + lpdf**2, 1e-20),
                )
            else:
                w = np.ones(R)
                add_em = hit & is_em & (depth == 0)
            out[add_em] += tp[add_em] * em[add_em] * w[add_em, None]

            if strategy in ("nee", "mis") and nl > 0:
                li = light_tris[rng.integers(0, nl, R)]
                u1, u2 = rng.random(R), rng.random(R)
                su = np.sqrt(u1)
                b0, b1 = 1 - su, u2 * su
                lp = (
                    tri_pos[li, 0] * b0[:, None]
                    + tri_pos[li, 1] * b1[:, None]
                    + tri_pos[li, 2] * (1 - b0 - b1)[:, None]
                )
                tol = lp - pos
                dist = np.linalg.norm(tol, axis=-1)
                wi = tol / np.maximum(dist[:, None], 1e-12)
                cos_s = np.sum(n * wi, -1)
                cos_l = np.sum(tri_n[li] * (-wi), -1)
                pdf_a = (1.0 / nl) / np.maximum(tri_area[li], 1e-12)
                pdf_sa = pdf_a * dist**2 / np.maximum(cos_l, 1e-6)
                cand = hit & (cos_s > 0) & (cos_l > 1e-6)
                so = pos + n * 1e-3
                ts, trs, _, _ = intersect(
                    tri_pos, so, wi, np.full(R, 1e-3), dist - 2e-3
                )
                vis = trs < 0
                f = albedo[mat] / np.pi
                if strategy == "mis":
                    bp = np.maximum(cos_s, 0) / np.pi
                    wmis = pdf_sa**2 / np.maximum(pdf_sa**2 + bp**2, 1e-20)
                else:
                    wmis = np.ones(R)
                contrib = (
                    tp
                    * f
                    * emissive[tri_mat[li]]
                    * (np.maximum(cos_s, 0) * wmis / np.maximum(pdf_sa, 1e-12))[:, None]
                )
                m = cand & vis
                out[m] += contrib[m]

            # bounce
            wi = cosine_sample(n, rng)
            cos_i = np.maximum(np.sum(n * wi, -1), 0.0)
            pdf = cos_i / np.pi
            f = albedo[mat] / np.pi
            tp = tp * f * np.where(pdf > 1e-9, cos_i / np.maximum(pdf, 1e-9), 0.0)[:, None]
            alive = hit & (pdf > 1e-9) & (tp.max(-1) > 0)
            o = pos + n * 1e-3
            d = wi
            prev_pdf = pdf
            if not alive.any():
                break
        acc += out
    return acc / spp
