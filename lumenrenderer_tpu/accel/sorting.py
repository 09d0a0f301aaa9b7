"""Ray sorting for coherence — stream compaction's second half.

The reference leans on RT-core hardware to absorb incoherent secondary rays;
the TPU pipeline instead *sorts* them (the north star's "compaction via
sort/scan"): group rays by direction octant (major) and origin Morton cell
(minor) so each 128-ray intersector tile becomes a compact cone of nearby
origins — exactly what the tile-frustum culling (`accel/tiled.py`) wants.

Used for bounce and shadow rays (primary rays are already block-swizzled).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm
from . import morton


def ray_sort_key(o, d, scene_lo, scene_hi) -> jnp.ndarray:
    """uint32 key: [octant(3) | origin morton(21)]."""
    octant = (
        (d[:, 0] >= 0).astype(jnp.uint32)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | ((d[:, 2] >= 0).astype(jnp.uint32) << 2)
    )
    m = morton.morton3d(o, scene_lo, scene_hi) >> 9  # top 21 bits
    return (octant << 29) | m


def sorted_intersectors(isect, occl, scene_lo, scene_hi):
    """Wrap (intersect_fn, occlude_fn) with sort → query → unsort."""
    lo = jnp.asarray(scene_lo, jnp.float32)
    hi = jnp.asarray(scene_hi, jnp.float32)

    def _prep(o, d, tn, tx):
        r = o.shape[0]
        tn_b = jnp.broadcast_to(jnp.asarray(tn, jnp.float32), (r,))
        tx_b = jnp.broadcast_to(jnp.asarray(tx, jnp.float32), (r,))
        key = ray_sort_key(o, d, lo, hi)
        # dead rays sort last so live tiles stay pure (tight frusta) AND
        # fully-dead tiles get visit count 0 (the Pallas kernel skips them)
        key = jnp.where(tx_b > tn_b, key, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(key)
        # ONE (R,8) row-gather permute instead of four separate permutes
        # (per-array gathers have a high fixed cost on TPU)
        packed = jnp.concatenate(
            [o, d, tn_b[:, None], tx_b[:, None]], axis=1
        )[order]
        return (order, packed[:, 0:3], packed[:, 3:6], packed[:, 6],
                packed[:, 7])

    def isect_sorted(o, d, tn, tx):
        order, os_, ds_, tns, txs = _prep(o, d, tn, tx)
        res = isect(os_, ds_, tns, txs)
        inv = jnp.argsort(order)
        # unsort per-ray fields with ONE packed gather; pass scalars through
        per_ray = {k2: v for k2, v in res.items() if v.ndim > 0}
        scalars = {k2: v for k2, v in res.items() if v.ndim == 0}
        names = sorted(per_ray)

        def to_f32(v):  # lossless: int32 rides as raw bits
            if v.dtype == jnp.int32:
                return jax.lax.bitcast_convert_type(v, jnp.float32)
            return v.astype(jnp.float32)

        def from_f32(v, dt):
            if dt == jnp.int32:
                return jax.lax.bitcast_convert_type(v, jnp.int32)
            return v.astype(dt)

        cat = jnp.stack([to_f32(per_ray[k2]) for k2 in names], axis=1)[inv]
        out = {
            k2: from_f32(cat[:, i_], per_ray[k2].dtype)
            for i_, k2 in enumerate(names)
        }
        out.update(scalars)
        return out

    def occl_sorted(o, d, tn, tx):
        order, os_, ds_, tns, txs = _prep(o, d, tn, tx)
        res = occl(os_, ds_, tns, txs)
        inv = jnp.argsort(order)
        return res[inv]

    return isect_sorted, occl_sorted
