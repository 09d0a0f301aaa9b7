"""Pair-admission intersector: per-RAY exact cluster admission (round 5).

Third-generation TPU intersector. The r4 tiled path (`accel/tiled.py` +
`ops/pallas/intersect.py`) culls at 128-ray-tile granularity, so every ray
pays for the UNION of its tile's clusters: sorted bounce tiles admit ~21
clusters ≈ 2,700 triangle tests/ray where ~10 would do (docs/PERF.md).
This module refines admission to the individual ray and restructures the
kernel around (ray, cluster) PAIRS (VERDICT r4 #1):

1. Tile-level cull (reused from accel/tiled.py: dense / frustum / packet
   tree walk) → per-tile candidate cluster lists, as before.
2. Per-ray REFINE: each ray slab-tests exactly its tile's candidate
   clusters — an (T,128,mv) elementwise pass, cheap — keeping only the
   clusters that ray actually enters within its [t_min, t_max].
3. Pair emission: surviving (ray, cluster) pairs are compacted
   (size-bounded, overflow-flagged), sorted cluster-major, and each
   cluster's run padded to 128-pair boundaries.
4. Kernel (`ops/pallas/pair_intersect.py`): every 128-pair tile is ONE
   Möller–Trumbore bilinear matmul against its single cluster — full lane
   occupancy, zero union waste, no visit loop.
5. Per-ray reduction: per-pair packed keys scatter back into the ray's
   (mv) candidate slots; min over slots = closest hit (or any = occlusion).

≙ reference per-ray RT-core traversal (`OptixWrapper.cpp:543-567`); the
TPU-native equivalent of "each ray walks exactly its own BVH path" is
"each ray emits exactly its own pair work".
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .stream import ClusterSet, ray_features
from .tiled import RAY_TILE, _frustum_visits, _pad, _tile_tree_visits

PAIR_GROUP = RAY_TILE * 8   # S must be a multiple of this (kernel G=8)


def _refine_hits(cs: ClusterSet, o, d, tn, tx, sel, valid, tiles: int):
    """Exact per-ray slab test against the tile's admitted clusters.

    Returns hit (tiles, 128, mv) bool — ray r admits visit slot s iff the
    ray individually enters cluster sel[tile(r), s] within [tn, tx]."""
    blo = cs.aabb_lo[sel]                       # (T, mv, 3)
    bhi = cs.aabb_hi[sel]
    eps = 1e-20
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    ot = o.reshape(tiles, RAY_TILE, 1, 3)
    it = inv.reshape(tiles, RAY_TILE, 1, 3)
    t0 = (blo[:, None] - ot) * it               # (T, 128, mv, 3) — fused
    t1 = (bhi[:, None] - ot) * it
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn_r = tn.reshape(tiles, RAY_TILE, 1)
    tx_r = tx.reshape(tiles, RAY_TILE, 1)
    return (
        (tnear <= tfar)
        & (tfar >= tn_r)
        & (tnear <= tx_r)
        & (tx_r >= tn_r)                        # dead lanes emit no pairs
        & valid[:, None, :]
    )


def _emit_sorted_pairs(hit, sel, c: int, mv: int, p_cap: int, s_cap: int):
    """Compact the refine mask into cluster-major, run-padded pair streams.

    Returns (idx (P,) flat slot index ray*mv+slot (n_slots = park),
    dest_orig (P,) position of each pair in the padded S stream,
    pair_ray_s (S,), tile_cluster (S/128,), overflow)."""
    tiles = hit.shape[0]
    n_rays = tiles * RAY_TILE
    n_slots = n_rays * mv
    flat = hit.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=p_cap, fill_value=n_slots)
    idx = idx.astype(jnp.int32)
    overflow = jnp.count_nonzero(flat) > p_cap
    p_valid = idx < n_slots
    pair_ray = idx // mv                        # sentinel -> exactly n_rays
    pair_slot = idx % mv
    r_tile = jnp.minimum(pair_ray // RAY_TILE, tiles - 1)
    pair_cluster = sel[r_tile, pair_slot]
    ckey = jnp.where(p_valid, pair_cluster, c)  # park invalid at c
    perm = jnp.argsort(ckey)
    ckey_s = ckey[perm]
    ray_s = pair_ray[perm]
    # run starts/counts WITHOUT scatters: binary search over the sorted keys
    cl = jnp.arange(c, dtype=ckey_s.dtype)
    starts = jnp.searchsorted(ckey_s, cl, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(ckey_s, cl, side="right").astype(jnp.int32)
    counts = ends - starts
    padded = ((counts + RAY_TILE - 1) // RAY_TILE) * RAY_TILE
    offsets = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    csafe = jnp.minimum(ckey_s, c - 1)
    rank = jnp.arange(p_cap, dtype=jnp.int32) - starts[csafe]
    valid_s = ckey_s < c
    dest = jnp.where(valid_s, offsets[csafe] + rank, s_cap)
    pair_ray_s = jnp.full((s_cap + 1,), n_rays, jnp.int32).at[dest].set(
        ray_s, unique_indices=True)[:s_cap]
    cluster_s = jnp.full((s_cap + 1,), -1, jnp.int32).at[dest].set(
        ckey_s, unique_indices=True)[:s_cap]
    tile_cluster = jnp.maximum(
        jnp.max(cluster_s.reshape(s_cap // RAY_TILE, RAY_TILE), axis=1), 0
    )
    # padded-stream position of each pair in ORIGINAL (ray-major) order
    dest_orig = jnp.zeros((p_cap,), jnp.int32).at[perm].set(
        dest, unique_indices=True)
    return idx, dest_orig, pair_ray_s, tile_cluster, overflow


@partial(jax.jit, static_argnames=("mv", "max_pairs_per_ray", "closest",
                                   "precision", "culling", "decode",
                                   "interpret"))
def _query_impl(cs: ClusterSet, origins, dirs, t_min, t_max, *, mv: int,
                max_pairs_per_ray: int, closest: bool, precision: str,
                culling: str, decode: bool, interpret: bool):
    r = origins.shape[0]
    c = cs.num_clusters
    k = cs.tris_per_cluster
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    r_pad = (-r) % PAIR_GROUP
    o = _pad(origins, r_pad, 0.0)
    d = _pad(dirs, r_pad, 1.0)
    tn = _pad(t_min_b, r_pad, 0.0)
    tx = _pad(t_max_b, r_pad, -1.0)             # padded rays dead
    rp = r + r_pad
    tiles = rp // RAY_TILE
    mv = min(mv, c)

    # ---- 1. tile-granular cull (shared with accel/tiled.py) ----
    if culling == "auto":
        culling = "frustum" if c <= 2048 else "tree"
    if culling == "frustum":
        sel, valid, _tnear, cull_ovf = _frustum_visits(
            cs, o, d, tn, tx, tiles, mv)
    else:
        sel, valid, _tnear, cull_ovf = _tile_tree_visits(
            cs, o, d, tn, tx, tiles, mv)
    sel = sel.astype(jnp.int32)

    # ---- 2. per-ray refine + 3. pair emission ----
    hit = _refine_hits(cs, o, d, tn, tx, sel, valid, tiles)
    p_cap = -(-(rp * max_pairs_per_ray) // PAIR_GROUP) * PAIR_GROUP
    s_cap = -(-(p_cap + c * RAY_TILE) // PAIR_GROUP) * PAIR_GROUP
    idx, dest_orig, pair_ray_s, tile_cluster, pair_ovf = _emit_sorted_pairs(
        hit, sel, c, mv, p_cap, s_cap)
    overflow = cull_ovf | pair_ovf

    # ---- 4. pair kernel ----
    from ..ops.pallas import pair_intersect as pk
    from ..ops.pallas.intersect import KEY_MISS

    k_bits = max((k - 1).bit_length(), 1)
    rf = ray_features(o, d)
    rf12 = jnp.concatenate([rf, tn[:, None], tx[:, None]], axis=1)
    dead_row = jnp.zeros((1, 12), jnp.float32).at[0, 10].set(1.0)  # tmax<tmin
    rf12x = jnp.concatenate([rf12, dead_row], axis=0)
    rf_pairs = rf12x[jnp.minimum(pair_ray_s, rp)]
    out_s = pk.pair_scan(
        rf_pairs, cs.tri_feat, tile_cluster, k=k, k_bits=k_bits,
        closest=closest, interpret=interpret, precision=precision,
    )

    # ---- 5. per-ray reduction via the ray's (mv) candidate slots ----
    miss_val = KEY_MISS if closest else 0
    out_ext = jnp.concatenate([out_s, jnp.full((1,), miss_val, jnp.int32)])
    out_orig = out_ext[jnp.minimum(dest_orig, s_cap)]   # original pair order
    n_slots = rp * mv
    slots = jnp.full((n_slots + 1,), miss_val, jnp.int32).at[idx].set(
        out_orig, unique_indices=True)[:n_slots].reshape(rp, mv)

    if not closest:
        occ = jnp.any(slots > 0, axis=1)[:r] & (t_max_b >= t_min_b)
        return {
            "t": jnp.full((r,), jnp.inf),
            "tri": jnp.full((r,), -1, jnp.int32),
            "u": jnp.zeros((r,)),
            "v": jnp.zeros((r,)),
            "occluded": occ,
            "overflow": overflow,
        }

    best = jnp.min(slots, axis=1)
    slot_win = jnp.argmin(slots, axis=1).astype(jnp.int32)
    found = (best < KEY_MISS)[:r]
    ray_ids = jnp.arange(rp, dtype=jnp.int32)
    cluster_win = sel[ray_ids // RAY_TILE, slot_win]
    low_mask = jnp.int32(~((1 << k_bits) - 1))
    k_win = (best & ((1 << k_bits) - 1))[:r]
    cl_w = jnp.maximum(cluster_win, 0)[:r]
    tri_g = cs.tri_id[cl_w, k_win]
    if not decode:
        # fast path: exact t/u/v re-derived downstream by extract_surface_data
        # (same contract as accel/tiled.py decode=False); t is the key's
        # quantized distance, good to ~2^-(23-k_bits)
        t_key = jax.lax.bitcast_convert_type(best[:r] & low_mask, jnp.float32)
        return {
            "t": jnp.where(found, t_key, jnp.inf),
            "tri": jnp.where(found, tri_g, -1),
            "u": jnp.zeros((r,)),
            "v": jnp.zeros((r,)),
            "occluded": found,
            "overflow": overflow,
        }
    # exact winner re-derivation: ONE (r,10,4) coefficient gather + einsum
    cols = cs.tri_feat.reshape(c, 10, 4, k)[cl_w, :, :, k_win]
    rf_r = ray_features(origins, dirs)
    res4 = jnp.einsum("rf,rfc->rc", rf_r, cols,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    det = res4[:, 0]
    okd = jnp.abs(det) > 1e-12
    inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
    u_e = res4[:, 1] * inv
    v_e = res4[:, 2] * inv
    t_e = res4[:, 3] * inv
    found = found & okd
    return {
        "t": jnp.where(found, t_e, jnp.inf),
        "tri": jnp.where(found, tri_g, -1),
        "u": jnp.where(found, u_e, 0.0),
        "v": jnp.where(found, v_e, 0.0),
        "occluded": found,
        "overflow": overflow,
    }


def _query(cs, origins, dirs, t_min, t_max, *, mv, max_pairs_per_ray, closest,
           precision, culling, decode, interpret=None):
    """AD-safe wrapper: pair_scan outputs are discrete and pallas_call has no
    JVP rule (same guard as ops/pallas/intersect.py:visit_scan)."""
    import numpy as _np

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    impl = partial(_query_impl, mv=mv, max_pairs_per_ray=max_pairs_per_ray,
                   closest=closest, precision=precision, culling=culling,
                   decode=decode, interpret=interpret)

    @jax.custom_jvp
    def call(cs, o, d, tn, tx):
        return impl(cs, o, d, tn, tx)

    @call.defjvp
    def _jvp(primals, tangents):
        out = call(*primals)
        # float outputs carry zero tangents (results are detached by design);
        # int/bool outputs carry symbolic-zero float0 tangents
        zeros = jax.tree_util.tree_map(
            lambda a: (jnp.zeros(a.shape, a.dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating)
                       else _np.zeros(a.shape, jax.dtypes.float0)), out)
        return out, zeros

    return call(cs, origins, dirs, t_min, t_max)


def intersect_closest(cs: ClusterSet, origins, dirs, t_min, t_max,
                      max_visits: int = 128, max_pairs_per_ray: int = 8,
                      precision: str = "high", culling: str = "auto",
                      decode: bool = True, interpret=None):
    return _query(cs, origins, dirs, t_min, t_max, mv=max_visits,
                  max_pairs_per_ray=max_pairs_per_ray, closest=True,
                  precision=precision, culling=culling, decode=decode,
                  interpret=interpret)


def intersect_any(cs: ClusterSet, origins, dirs, t_min, t_max,
                  max_visits: int = 128, max_pairs_per_ray: int = 8,
                  precision: str = "high", culling: str = "auto",
                  interpret=None):
    return _query(cs, origins, dirs, t_min, t_max, mv=max_visits,
                  max_pairs_per_ray=max_pairs_per_ray, closest=False,
                  precision=precision, culling=culling, decode=False,
                  interpret=interpret)["occluded"]


def pair_intersectors(cs: ClusterSet, max_visits: int = 128,
                      max_pairs_per_ray: int = 8, precision: str = "high",
                      culling: str = "auto", decode: bool = True,
                      interpret=None) -> Tuple:
    """Bind a ClusterSet into (intersect_fn, occlude_fn) for the wavefront
    loop — same contract as accel/tiled.py:tiled_intersectors."""

    def isect(o, d, tn, tx):
        res = intersect_closest(
            cs, o, d, tn, tx, max_visits=max_visits,
            max_pairs_per_ray=max_pairs_per_ray, precision=precision,
            culling=culling, decode=decode, interpret=interpret)
        return {q: res[q] for q in ("t", "tri", "u", "v", "overflow")}

    def occl(o, d, tn, tx):
        return intersect_any(
            cs, o, d, tn, tx, max_visits=max_visits,
            max_pairs_per_ray=max_pairs_per_ray, precision=precision,
            culling=culling, interpret=interpret)

    return isect, occl
