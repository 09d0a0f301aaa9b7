"""Tiled-stream intersector: ray-tile × cluster batched Möller–Trumbore.

Second-generation TPU intersector (evolution of `accel/stream.py`, measured
on v5e): the pair-stream design was dominated by XLA per-row gathers
(~0.17 µs/row × ~500k pair rows). This design removes them:

- Rays are processed in TILES of 128 *consecutive* rays. A tile's ray
  features are a contiguous reshape — no gather.
- Per ray-tile, the union of clusters any of its rays hits is computed
  densely from the (tiles, C) AABB test, ordered by entry distance, and
  capped at `max_visits` (overflow reported, never silent).
- A `lax.scan` over the visit slots does one batched matmul per step:
  (tiles, 128, 10) x (tiles, 10, 4K) — MT's bilinear form on the MXU —
  and folds the running closest-hit reduction in-place. The only gathers
  left are `max_visits × tiles` 20 KB cluster-feature rows.
- The final per-ray reduction is a reshape-min — no scatter.

Coherence note: consecutive rays = scanline-coherent for primary/shadow
rays; bounce rays benefit from the optional pixel-block swizzle in the
integrator. Incoherent tiles just visit more clusters (overflow flag warns).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .stream import ClusterSet, build_clusters, ray_features  # shared build

RAY_TILE = 128


def _ray_cluster_window(cs: ClusterSet, o, d, t_min, t_max):
    """Dense (R,C) slab test → (hit, t_near)."""
    inv = 1.0 / jnp.where(jnp.abs(d) > 1e-20, d, jnp.where(d >= 0, 1e-20, -1e-20))
    t0 = (cs.aabb_lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cs.aabb_hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tn <= tf) & (tf >= t_min[:, None]) & (tn <= t_max[:, None])
    return hit, jnp.where(hit, jnp.maximum(tn, 0.0), jnp.inf)


def _pad(a, r_pad, fill):
    return jnp.pad(a, ((0, r_pad),) + ((0, 0),) * (a.ndim - 1), constant_values=fill)


# ---------------------------------------------------------------------------
# hierarchical tile culling (large scenes): conservative interval-ray packet
# traversal of the second-level cluster tree — replaces the dense (R,C) mask
# whose cost is O(R*C). Packet/interval traversal is the classic CPU-SIMD
# idea (Wald et al.) re-expressed per 128-ray tile; soundness = no false
# misses (axis with 0 in the direction interval imposes no constraint).
# ---------------------------------------------------------------------------

def _tile_bounds(o, d, tn, tx, tiles: int, tile: int):
    """Per-tile conservative interval bounds over the live rays."""
    ot = o.reshape(tiles, tile, 3)
    dt = d.reshape(tiles, tile, 3)
    alive = (tx > tn).reshape(tiles, tile)
    big = jnp.float32(3e37)
    olo = jnp.min(jnp.where(alive[..., None], ot, big), axis=1)
    ohi = jnp.max(jnp.where(alive[..., None], ot, -big), axis=1)
    dlo = jnp.min(jnp.where(alive[..., None], dt, big), axis=1)
    dhi = jnp.max(jnp.where(alive[..., None], dt, -big), axis=1)
    t_cap = jnp.max(jnp.where(alive, tx.reshape(tiles, tile), -big), axis=1)
    any_alive = jnp.any(alive, axis=1)
    return olo, ohi, dlo, dhi, t_cap, any_alive


def _frustum_visits(cs: ClusterSet, o, d, tn, tx, tiles: int, mv: int):
    """Tile-granular dense culling: conservative interval-ray (packet) slab
    test of every (tile, cluster) pair — O(T*C) instead of the per-ray dense
    path's O(R*C), at slightly looser bounds (frustum vs exact ray union).
    Returns (order (T,mv), valid (T,mv), tnear (T,mv) sorted asc, overflow)."""
    olo, ohi, dlo, dhi, t_cap, any_alive = _tile_bounds(
        o, d, tn, tx, tiles, RAY_TILE
    )
    eps = 1e-20
    inv_a = 1.0 / jnp.where(jnp.abs(dlo) > eps, dlo, eps)        # (T,3)
    inv_b = 1.0 / jnp.where(jnp.abs(dhi) > eps, dhi, eps)
    zero_in_d = (dlo <= 0.0) & (dhi >= 0.0)                      # (T,3)
    blo = cs.aabb_lo[None, :, :]                                 # (1,C,3)
    bhi = cs.aabb_hi[None, :, :]
    nmin = blo - ohi[:, None, :]                                 # (T,C,3)
    nmax = bhi - olo[:, None, :]
    # interval product corners bound every per-ray slab t
    c1 = nmin * inv_a[:, None, :]
    c2 = nmin * inv_b[:, None, :]
    c3 = nmax * inv_a[:, None, :]
    c4 = nmax * inv_b[:, None, :]
    ent = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
    exi = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
    ent = jnp.where(zero_in_d[:, None, :], -jnp.inf, ent)
    exi = jnp.where(zero_in_d[:, None, :], jnp.inf, exi)
    tn_lb = jnp.max(ent, axis=-1)                                # (T,C)
    tf_ub = jnp.min(exi, axis=-1)
    hit = (
        (tn_lb <= tf_ub)
        & (tf_ub >= 0.0)
        & (tn_lb <= t_cap[:, None])
        & any_alive[:, None]
    )
    tnear = jnp.where(hit, jnp.maximum(tn_lb, 0.0), jnp.inf)
    neg_t, idx = jax.lax.top_k(-tnear, mv)                       # asc by tnear
    valid = jnp.isfinite(neg_t)
    overflow = jnp.any(jnp.sum(hit, axis=1) > mv)
    return idx.astype(jnp.int32), valid, -neg_t, overflow


def _tile_tree_visits(cs: ClusterSet, o, d, tn, tx, tiles: int, mv: int):
    """Returns (order (T,mv) cluster ids, valid (T,mv), tnear (T,mv) sorted
    ascending, overflow)."""
    olo, ohi, dlo, dhi, t_cap, any_alive = _tile_bounds(
        o, d, tn, tx, tiles, RAY_TILE
    )

    def possible_hit(blo, bhi, olo1, ohi1, dlo1, dhi1, cap):
        # per-axis candidate t products (conservative interval bounds)
        zero_in_d = (dlo1 <= 0.0) & (dhi1 >= 0.0)
        inv_a = 1.0 / jnp.where(jnp.abs(dlo1) > 1e-20, dlo1, 1e-20)
        inv_b = 1.0 / jnp.where(jnp.abs(dhi1) > 1e-20, dhi1, 1e-20)
        n1 = blo - ohi1
        n2 = blo - olo1
        n3 = bhi - ohi1
        n4 = bhi - olo1
        cands = jnp.stack(
            [n1 * inv_a, n1 * inv_b, n2 * inv_a, n2 * inv_b,
             n3 * inv_a, n3 * inv_b, n4 * inv_a, n4 * inv_b], axis=0
        )  # (8, 3)
        ent_lb = jnp.where(zero_in_d, -jnp.inf, jnp.min(cands, axis=0))
        exi_ub = jnp.where(zero_in_d, jnp.inf, jnp.max(cands, axis=0))
        tn_lb = jnp.max(ent_lb)
        tf_ub = jnp.min(exi_ub)
        return (tn_lb <= tf_ub) & (tf_ub >= 0.0) & (tn_lb <= cap), jnp.maximum(
            tn_lb, 0.0
        )

    max_stack = cs.tree_depth + 2

    def traverse_tile(olo1, ohi1, dlo1, dhi1, cap, ok_tile):
        stack = jnp.zeros((max_stack,), jnp.int32)
        tstack = jnp.zeros((max_stack,), jnp.float32)
        root_hit, root_tn = possible_hit(
            cs.tree_lo[0], cs.tree_hi[0], olo1, ohi1, dlo1, dhi1, cap
        )
        sp = jnp.where(root_hit & ok_tile, 1, 0).astype(jnp.int32)
        tstack = tstack.at[0].set(root_tn)
        visits = jnp.zeros((mv,), jnp.int32)
        vtn = jnp.full((mv,), jnp.inf, jnp.float32)
        count = jnp.int32(0)

        def cond(st):
            sp = st[0]
            return sp > 0

        def body(st):
            sp, stack, tstack, visits, vtn, count = st
            node = stack[sp - 1]
            node_tn = tstack[sp - 1]
            sp = sp - 1
            c0 = cs.tree_child0[node]
            c1 = cs.tree_child1[node]
            is_leaf = c0 < 0
            # leaf: append cluster (drop when full -> overflow)
            leaf_idx = jnp.maximum(-c0 - 1, 0)
            cluster = cs.tree_leaf_cluster[leaf_idx]
            slot = jnp.minimum(count, mv - 1)
            take = is_leaf & (count < mv)
            visits = jnp.where(take, visits.at[slot].set(cluster), visits)
            vtn = jnp.where(take, vtn.at[slot].set(node_tn), vtn)
            count = count + is_leaf.astype(jnp.int32)
            # internal: push children that possibly hit, near-first pop
            c0i = jnp.maximum(c0, 0)
            h0, tn0 = possible_hit(
                cs.tree_lo[c0i], cs.tree_hi[c0i], olo1, ohi1, dlo1, dhi1, cap
            )
            h1, tn1 = possible_hit(
                cs.tree_lo[c1], cs.tree_hi[c1], olo1, ohi1, dlo1, dhi1, cap
            )
            h0 = h0 & ~is_leaf
            h1 = h1 & ~is_leaf
            swap = tn1 < tn0
            near = jnp.where(swap, c1, c0i)
            far = jnp.where(swap, c0i, c1)
            t_near = jnp.where(swap, tn1, tn0)
            t_far = jnp.where(swap, tn0, tn1)
            h_near = jnp.where(swap, h1, h0)
            h_far = jnp.where(swap, h0, h1)
            stack = jnp.where(h_far, stack.at[sp].set(far), stack)
            tstack = jnp.where(h_far, tstack.at[sp].set(t_far), tstack)
            sp_f = sp + h_far.astype(jnp.int32)
            stack = jnp.where(h_near, stack.at[sp_f].set(near), stack)
            tstack = jnp.where(h_near, tstack.at[sp_f].set(t_near), tstack)
            sp = sp_f + h_near.astype(jnp.int32)
            return sp, stack, tstack, visits, vtn, count

        _, _, _, visits, vtn, count = jax.lax.while_loop(
            cond, body, (sp, stack, tstack, visits, vtn, count)
        )
        return visits, vtn, count

    visits, vtn, counts = jax.vmap(traverse_tile)(
        olo, ohi, dlo, dhi, t_cap, any_alive
    )
    # near-first pops are only approximately sorted; the packed-key closest
    # reduction is order-independent but the ordered EARLY-OUT requires
    # strictly ascending entry t — sort the (small) visit lists.
    sort_idx = jnp.argsort(vtn, axis=1)
    visits = jnp.take_along_axis(visits, sort_idx, axis=1)
    vtn = jnp.take_along_axis(vtn, sort_idx, axis=1)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (tiles, mv), 1) < counts[:, None]
    )
    overflow = jnp.any(counts > mv)
    return visits, valid, jnp.where(valid, vtn, jnp.inf), overflow


@partial(jax.jit, static_argnames=("max_visits", "closest", "candidate_dtype",
                                   "use_pallas", "culling", "decode"))
def _query(cs: ClusterSet, origins, dirs, t_min, t_max,
           max_visits: int, closest: bool, candidate_dtype: str = "float32",
           use_pallas: bool = False, culling: str = "auto",
           decode: bool = True):
    r = origins.shape[0]
    t_min_b = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    # the Pallas kernel writes (tiles//8, 8, 128) key blocks — pad to 8 tiles
    r_pad = (-r) % (RAY_TILE * 8 if use_pallas else RAY_TILE)
    o = _pad(origins, r_pad, 0.0)
    d = _pad(dirs, r_pad, 1.0)
    tn = _pad(t_min_b, r_pad, 0.0)
    tx = _pad(t_max_b, r_pad, -1.0)  # padded rays dead (t_max < t_min)
    rp = r + r_pad
    tiles = rp // RAY_TILE
    k = cs.tris_per_cluster
    c = cs.num_clusters
    mv = min(max_visits, c)

    if use_pallas and (4 * k) % 128 != 0 and jax.default_backend() == "tpu":
        # Mosaic DMA slices must be 128-lane aligned: the fused kernel needs
        # cluster_size >= 32 when compiled; smaller clusters use the XLA scan
        use_pallas = False

    if culling == "auto":
        # frustum (O(T*C), tile-granular) is the Pallas default while the
        # dense (T,C) intermediates stay small; big scenes (1M tris ->
        # C~8k: ~1 GB per (T,C) array at 1440p) take the packet-tree walk
        culling = (
            ("frustum" if c <= 2048 else "tree") if use_pallas
            else ("dense" if c <= 512 else "tree")
        )
    if culling == "dense":
        # O(R*C) dense slab test, exact per-ray union — best for small C
        hit_rc, tnear_rc = _ray_cluster_window(cs, o, d, tn, tx)
        hit_tc = jnp.any(hit_rc.reshape(tiles, RAY_TILE, c), axis=1)      # (T,C)
        tnear_tc = jnp.min(tnear_rc.reshape(tiles, RAY_TILE, c), axis=1)  # (T,C)
        tnear_tc = jnp.where(hit_tc, tnear_tc, jnp.inf)
        order = jnp.argsort(tnear_tc, axis=1)[:, :mv]                     # (T,mv)
        valid_k = jnp.take_along_axis(hit_tc, order, axis=1)              # (T,mv)
        tnear_k = jnp.take_along_axis(tnear_tc, order, axis=1)
        overflow = jnp.any(jnp.sum(hit_tc, axis=1) > mv)
    elif culling == "frustum":
        order, valid_k, tnear_k, overflow = _frustum_visits(
            cs, o, d, tn, tx, tiles, mv
        )
    else:
        # O(T * log C) conservative packet traversal of the cluster tree
        order, valid_k, tnear_k, overflow = _tile_tree_visits(
            cs, o, d, tn, tx, tiles, mv
        )

    rf = ray_features(o, d).reshape(tiles, RAY_TILE, 10)
    tmin_t = tn.reshape(tiles, RAY_TILE)
    tmax_t = tx.reshape(tiles, RAY_TILE)

    # Closest-hit carries ONE packed int32 key per ray:
    #   key = (bitcast(t) & ~0xFFF) | (step << 8) | k
    # Positive-float bit patterns are order-preserving, so min(key) == the
    # nearest hit up to 2^-11 relative t (ties resolve to any co-near
    # triangle); exact t/u/v come from one coefficient gather afterwards.
    # This replaces per-step argmin + 4 take_along_axis (measured dominant).
    k_bits = max((k - 1).bit_length(), 1)
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits
    # low_bits eat float-t mantissa resolution in the ordering key: 15 low
    # bits leave 8 mantissa bits => winner unique to ~2^-8 relative t (exact
    # t/u/v are re-derived for the winner, so ties just pick a co-near tri)
    assert low_bits <= 15, f"packed-key layout overflow: {k=} {mv=}"
    low_mask = jnp.int32(~((1 << low_bits) - 1))
    KEY_MISS = jnp.int32(0x7F000000)

    step_ids = jnp.arange(mv, dtype=jnp.int32)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)

    def step(carry, inputs):
        best_key, occ = carry
        sel, ok_k, step_i = inputs                          # (T,), (T,), ()
        feats = cs.tri_feat[sel]                            # (T,10,4K)
        tid = cs.tri_id[sel]                                # (T,K)
        if candidate_dtype == "bfloat16":
            # candidate pass in bf16 (4x MXU rate); the winner is re-derived
            # exactly in f32 afterwards, so only near-edge candidate
            # classification is approximate
            res = jnp.einsum(
                "trf,tfc->trc",
                rf.astype(jnp.bfloat16),
                feats.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        else:
            # explicit HIGHEST/HIGH: the TPU matmul default is one bf16 pass,
            # which silently turns "float32" candidates into bf16 ones
            res = jnp.einsum(
                "trf,tfc->trc", rf, feats, preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGH if candidate_dtype == "high"
                           else jax.lax.Precision.HIGHEST),
            )
        det = res[..., 0 * k : 1 * k]
        okd = jnp.abs(det) > 1e-12
        inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
        u = res[..., 1 * k : 2 * k] * inv
        v = res[..., 2 * k : 3 * k] * inv
        t = res[..., 3 * k : 4 * k] * inv
        hit = (
            okd
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin_t[..., None])
            & (t <= tmax_t[..., None])
            & (tid[:, None, :] >= 0)
            & ok_k[:, None, None]
        )
        if closest:
            tb = jax.lax.bitcast_convert_type(
                jnp.maximum(t, 0.0), jnp.int32
            )
            key = (tb & low_mask) | (step_i << k_bits) | k_ids
            key = jnp.where(hit, key, KEY_MISS)
            best_key = jnp.minimum(best_key, jnp.min(key, axis=-1))
        occ = occ | jnp.any(hit, axis=-1)
        return (best_key, occ), None

    if use_pallas:
        # fused visit-adaptive Pallas kernel (see ops/pallas/intersect.py):
        # per-tile fori_loop over its actual visits, double-buffered feature
        # DMA, packed-key min resident in VMEM, ordered early-out. Returns
        # keys only; the exact winner decode below is SHARED with the scan
        # path (the earlier in-kernel value pick mis-compiled under Mosaic).
        import jax as _jax

        from ..ops.pallas import intersect as pk

        rf12 = jnp.concatenate([rf.reshape(rp, 10), tn[:, None], tx[:, None]],
                               axis=1)
        rf_t = rf12.reshape(tiles, RAY_TILE, 12)
        sel = order.astype(jnp.int32)
        nv = jnp.sum(valid_k, axis=1).astype(jnp.int32)
        tn_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(tnear_k, 0.0).astype(jnp.float32), jnp.int32
        )
        tnb = jnp.where(
            valid_k, jnp.minimum(tn_bits, KEY_MISS - 1), jnp.int32(KEY_MISS)
        )
        prec = {"float32": "highest", "high": "high",
                "bfloat16": "default"}[candidate_dtype]
        out = pk.visit_scan(
            rf_t, cs.tri_feat, cs.tri_id, sel, nv, tnb,
            k=k, mv=mv, k_bits=k_bits, low_bits=low_bits, closest=closest,
            interpret=_jax.default_backend() != "tpu", precision=prec,
        )
        if not closest:
            occ_f = (out.reshape(rp)[:r] > 0) & ~(t_max_b < t_min_b)
            return {
                "t": jnp.full((r,), jnp.inf),
                "tri": jnp.full((r,), -1, jnp.int32),
                "u": jnp.zeros((r,)),
                "v": jnp.zeros((r,)),
                "occluded": occ_f,
                "overflow": overflow,
            }
        # dead lanes carry key 0 in-kernel (early-out); mask them to miss
        best_key = jnp.where(
            (tx < tn).reshape(tiles, RAY_TILE), jnp.int32(KEY_MISS), out
        )
    else:
        init = (
            jnp.full((tiles, RAY_TILE), KEY_MISS, jnp.int32),
            jnp.zeros((tiles, RAY_TILE), bool),
        )
        (best_key, occ), _ = jax.lax.scan(
            step, init, (order.T, valid_k.T, step_ids)
        )
        if not closest:
            return {
                "t": jnp.full((r,), jnp.inf),
                "tri": jnp.full((r,), -1, jnp.int32),
                "u": jnp.zeros((r,)),
                "v": jnp.zeros((r,)),
                "occluded": occ.reshape(-1)[:r],
                "overflow": overflow,
            }

    flat = lambda a: a.reshape(-1)[:r]
    # decode the winner key: step/k bits -> global triangle id (ONE small
    # (R,) gather from the (C,K) id table)
    bk = flat(best_key)
    found = bk < KEY_MISS
    k_win = bk & ((1 << k_bits) - 1)
    step_win = (bk >> k_bits) & ((1 << s_bits) - 1)
    tile_idx = (jnp.arange(r, dtype=jnp.int32) // RAY_TILE)
    cluster = order[tile_idx, step_win]                     # (R,)
    tri_g = cs.tri_id[jnp.maximum(cluster, 0), k_win]
    if not decode:
        # fast path (the renderer): exact t/u/v are re-derived downstream by
        # `extract_surface_data` via elementwise MT on its fused attr-table
        # gather — the (R,10,4) coefficient gather + einsum here measured
        # 59 ms/call and a ~590 MB HBM spike at 1440p. t is the key's
        # quantized distance (masked low bits), good to ~2^-(23-low_bits).
        t_key = jax.lax.bitcast_convert_type(bk & low_mask, jnp.float32)
        return {
            "t": jnp.where(found, t_key, jnp.inf),
            "tri": jnp.where(found, tri_g, -1),
            "u": jnp.zeros((r,)),
            "v": jnp.zeros((r,)),
            "occluded": found,
            "overflow": overflow,
        }
    # coefficient columns of the winning triangle — ONE (R,10,4) gather
    cols = cs.tri_feat.reshape(c, 10, 4, k)[jnp.maximum(cluster, 0), :, :, k_win]
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


def intersect_closest(cs: ClusterSet, origins, dirs, t_min, t_max,
                      max_visits: int = 12, candidate_dtype: str = "float32",
                      use_pallas: bool = False, culling: str = "auto",
                      decode: bool = True):
    return _query(cs, origins, dirs, t_min, t_max, max_visits, True,
                  candidate_dtype, use_pallas, culling, decode)


def intersect_any(cs: ClusterSet, origins, dirs, t_min, t_max,
                  max_visits: int = 12, candidate_dtype: str = "float32",
                  use_pallas: bool = False, culling: str = "auto"):
    return _query(cs, origins, dirs, t_min, t_max, max_visits, False,
                  candidate_dtype, use_pallas, culling)["occluded"]


def tiled_intersectors(cs: ClusterSet, max_visits: int = 12,
                       candidate_dtype: str = "float32",
                       use_pallas: bool = False, culling: str = "auto",
                       decode: bool = True) -> Tuple:
    def isect(o, d, tn, tx):
        res = intersect_closest(cs, o, d, tn, tx, max_visits=max_visits,
                                candidate_dtype=candidate_dtype,
                                use_pallas=use_pallas, culling=culling,
                                decode=decode)
        # overflow is surfaced (ADVICE r1): the wavefront loop ORs it into an
        # AOV so truncated visit lists are never silently dropped
        return {q: res[q] for q in ("t", "tri", "u", "v", "overflow")}

    def occl(o, d, tn, tx):
        return intersect_any(cs, o, d, tn, tx, max_visits=max_visits,
                             candidate_dtype=candidate_dtype,
                             use_pallas=use_pallas, culling=culling)

    return isect, occl
