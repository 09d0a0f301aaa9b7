"""Ray sorting for coherence — stream compaction's second half.

The reference leans on RT-core hardware to absorb incoherent secondary rays;
the TPU pipeline instead *sorts* them (the north star's "compaction via
sort/scan"): group rays by direction octant (major) and origin Morton cell
(minor) so each 128-ray intersector tile becomes a compact cone of nearby
origins — exactly what the tile-frustum culling (`accel/tiled.py`) wants.

Used for bounce and shadow rays (primary rays are already block-swizzled).
"""
from __future__ import annotations

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
        # dead rays sort last so live tiles stay pure (tight frusta)
        key = jnp.where(tx_b > tn_b, key, jnp.uint32(0xFFFFFFFF))
        order = jnp.argsort(key)
        return order, o[order], d[order], tn_b[order], tx_b[order]

    def isect_sorted(o, d, tn, tx):
        order, os_, ds_, tns, txs = _prep(o, d, tn, tx)
        res = isect(os_, ds_, tns, txs)
        inv = jnp.argsort(order)
        return {k2: v[inv] for k2, v in res.items()}

    def occl_sorted(o, d, tn, tx):
        order, os_, ds_, tns, txs = _prep(o, d, tn, tx)
        res = occl(os_, ds_, tns, txs)
        inv = jnp.argsort(order)
        return res[inv]

    return isect_sorted, occl_sorted
