"""Pallas TPU kernel: fused ray-tile × cluster Möller–Trumbore.

The XLA version of the tiled-stream inner loop (accel/tiled.py) materializes
a (tiles, 128, 4K) f32 candidate tensor in HBM every visit step — measured
to dominate traversal time. This kernel fuses matmul → decode → hit test →
packed-key min entirely in VMEM:

  grid = (tiles, max_visits); the visit dimension is innermost, so the
  (1, RAY_TILE) output key block stays resident in VMEM and accumulates
  across visits (revisited-output accumulation pattern). The per-visit
  cluster feature block (10, 4K) is DMA'd by the scalar-prefetched cluster
  id — the PrefetchScalarGridSpec index_map pattern from the TPU guide.

Division-free hit test (sign-aware MT) avoids per-candidate reciprocals;
only the t used for ordering divides, masked. Padded triangle slots have
all-zero features → det = 0 → natural miss (no id masking needed).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KEY_MISS = 0x7F000000  # python int: kernels must not capture traced constants


def _kernel_factory(k: int, mv: int, k_bits: int, low_bits: int):
    low_mask = ~((1 << low_bits) - 1)  # python int constant
    def kernel(sel_ref, okk_ref, rf_ref, tmin_ref, tmax_ref, feats_ref, key_ref):
        s_idx = pl.program_id(1)
        t_idx = pl.program_id(0)
        ok_step = okk_ref[t_idx * mv + s_idx]

        rf = rf_ref[0]          # (RT, 10)
        feats = feats_ref[0]    # (10, 4K)
        res = jnp.dot(rf, feats, preferred_element_type=jnp.float32)  # (RT,4K)
        det = res[:, 0 * k : 1 * k]
        u_num = res[:, 1 * k : 2 * k]
        v_num = res[:, 2 * k : 3 * k]
        t_num = res[:, 3 * k : 4 * k]

        s = jnp.sign(det)
        dets = det * s  # |det|
        ok = dets > 1e-12
        u_ok = u_num * s >= 0.0
        v_ok = v_num * s >= 0.0
        uv_ok = (u_num + v_num) * s <= dets
        tmin = tmin_ref[0][:, None]
        tmax = tmax_ref[0][:, None]
        ts = t_num * s
        t_ok = (ts > tmin * dets) & (ts <= tmax * dets)
        hit = ok & u_ok & v_ok & uv_ok & t_ok & (ok_step != 0)

        t_val = jnp.where(hit, t_num / jnp.where(ok, det, 1.0), 3.0e37)
        tb = pltpu.bitcast(jnp.maximum(t_val, 0.0), jnp.int32)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (t_val.shape[0], k), 1)
        key = (tb & jnp.int32(low_mask)) | (s_idx << k_bits) | k_ids
        key = jnp.where(hit, key, jnp.int32(KEY_MISS))
        kmin = jnp.min(key, axis=-1)  # (RT,)

        @pl.when(s_idx == 0)
        def _():
            key_ref[0] = kmin

        @pl.when(s_idx != 0)
        def _():
            key_ref[0] = jnp.minimum(key_ref[0], kmin)

    return kernel


@partial(jax.jit, static_argnames=("k", "mv", "k_bits", "low_bits", "interpret"))
def scan_keys(rf_tiles, tmin_t, tmax_t, feats, sel_flat, okk_flat,
              k: int, mv: int, k_bits: int, low_bits: int,
              interpret: bool = False):
    """rf_tiles: (T,RT,10); tmin/tmax: (T,RT); feats: (C,10,4K);
    sel_flat/okk_flat: (T*mv,) int32. Returns (T,RT) int32 packed keys."""
    tiles, rt, _ = rf_tiles.shape
    kernel = _kernel_factory(k, mv, k_bits, low_bits)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles, mv),
        in_specs=[
            pl.BlockSpec(
                (1, rt, 10), lambda t, s, sel, okk: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rt), lambda t, s, sel, okk: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rt), lambda t, s, sel, okk: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 10, 4 * k),
                lambda t, s, sel, okk: (sel[t * mv + s], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rt), lambda t, s, sel, okk: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles, rt), jnp.int32),
        interpret=interpret,
    )(sel_flat, okk_flat, rf_tiles, tmin_t, tmax_t, feats)
