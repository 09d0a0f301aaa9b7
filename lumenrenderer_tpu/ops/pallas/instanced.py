"""Pallas TPU kernel: instanced (two-level TLAS/BLAS) visit loop.

Variant of `ops/pallas/intersect.py` for `accel/two_level.py`: visits are
(instance, cluster) UNITS; each visit transforms the tile's rays into the
instance's OBJECT space (the reference gets this from OptiX transforming
rays at IAS leaves, `OptixWrapper.cpp:80-131`) and tests the mesh's
object-space cluster features — geometry lives once per unique mesh.

Differences from the single-level kernel:

- The ray block is TRANSPOSED (8 rows × 128 ray lanes): [o(3), d(3)] world
  rays, so the per-visit affine + Möller–Trumbore feature build are
  full-lane (1,128) VPU rows; the affine preserves the world t parameter,
  and the per-ray [t_min, t_max] window rides a second, ray-major (128, 8)
  block whose (128,1) column slices broadcast against the (128, 4K)
  candidate matrix exactly like the single-level kernel.
- The MT matmul contracts the TRANSPOSED features: dot_general((10,128)
  object-space ray features, (10,4K) cluster coefficients) → (128,4K), so
  rays land on sublanes exactly like the single-level kernel's output.
- Per-visit instance transforms (12 floats) ride a group-DMA'd SMEM block
  next to the visit lists.
- VMEM-resident feature table only (instanced scenes hold one copy per
  unique mesh, so the table is small; callers fall back to the XLA scan in
  accel/two_level.py when it exceeds RESIDENT_BYTES).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import FR, KEY_MISS, RT

EVERY_N = 4
RESIDENT_BYTES = 8 * 1024 * 1024


def _make_kernel(k: int, mv: int, k_bits: int, low_bits: int, closest: bool,
                 precision: str):
    low_mask = ~((1 << low_bits) - 1)
    dims = (((0,), (0,)), ((), ()))   # contract feature rows on both sides

    def kernel(selc0_ref, nv_ref, ray_ref, wnd_ref, selv_ref, tnbv_ref,
               minv_ref, feats_ref, out_ref, srow, trow, mrow, rsem):
        t = pl.program_id(0)
        row = jax.lax.rem(t, 8)
        n = nv_ref[t]
        rb = ray_ref[0]                    # (8, 128): o rows 0-2, d rows 3-5
        ox, oy, oz = rb[0:1], rb[1:2], rb[2:3]
        dx, dy, dz = rb[3:4], rb[4:5], rb[5:6]
        wnd = wnd_ref[0]                   # (128, 8): per-ray window, ray-
        tmin = wnd[:, 0:1]                 # major like the r4 kernel's rf so
        tmax = wnd[:, 1:2]                 # predicates get (128,1) sublanes
        dead = tmax < tmin

        @pl.when(row == 0)
        def _():
            cps = pltpu.make_async_copy(selv_ref.at[t // 8], srow, rsem.at[0])
            cpt = pltpu.make_async_copy(tnbv_ref.at[t // 8], trow, rsem.at[1])
            cpm = pltpu.make_async_copy(minv_ref.at[t // 8], mrow, rsem.at[2])
            cps.start()
            cpt.start()
            cpm.start()
            cps.wait()
            cpt.wait()
            cpm.wait()

        kid = jax.lax.broadcasted_iota(jnp.int32, (RT, k), 1)
        if closest:
            acc0 = jnp.full((RT, k), KEY_MISS, jnp.int32)
        else:
            acc0 = jnp.broadcast_to(dead.astype(jnp.int32), (RT, k))

        def compute(acc, i):
            # 12 instance-transform scalars for this visit (flat (8, mv*12)
            # SMEM row: HBM DMA slices need 128-aligned minor dims)
            m = [mrow[row, i * 12 + j] for j in range(12)]
            oox = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
            ooy = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
            ooz = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
            ddx = m[0] * dx + m[1] * dy + m[2] * dz
            ddy = m[4] * dx + m[5] * dy + m[6] * dz
            ddz = m[8] * dx + m[9] * dy + m[10] * dz
            mx = ooy * ddz - ooz * ddy
            my = ooz * ddx - oox * ddz
            mz = oox * ddy - ooy * ddx
            rfm = jnp.concatenate(
                [mx, my, mz, ddx, ddy, ddz, oox, ooy, ooz,
                 jnp.ones_like(oox)], axis=0)          # (10, 128)
            feats = feats_ref[srow[row, i]]            # (FR, 4K)
            f10 = feats[:10]
            if precision == "high":
                f_hi = f10.astype(jnp.bfloat16)
                f_lo = (f10 - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                r_hi = rfm.astype(jnp.bfloat16)
                r_lo = (rfm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                res = (
                    jax.lax.dot_general(r_hi, f_hi, dimension_numbers=dims,
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(r_hi, f_lo, dimension_numbers=dims,
                                          preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(r_lo, f_hi, dimension_numbers=dims,
                                          preferred_element_type=jnp.float32))
            else:
                res = jax.lax.dot_general(
                    rfm, f10, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                    precision={"highest": jax.lax.Precision.HIGHEST,
                               "default": jax.lax.Precision.DEFAULT}[precision])
            det = res[:, 0 * k:1 * k]
            un = res[:, 1 * k:2 * k]
            vn = res[:, 2 * k:3 * k]
            sn = res[:, 3 * k:4 * k]
            sgn = jnp.sign(det)
            ad = det * sgn
            us = un * sgn
            vs = vn * sgn
            ts = sn * sgn
            # the affine preserves the WORLD t parameter, so the per-ray
            # window test and the ordering key are identical to the
            # single-level kernel's
            hit = ((ad > 1e-12) & (us >= 0.0) & (vs >= 0.0)
                   & (us + vs <= ad) & (ts > tmin * ad) & (ts <= tmax * ad))
            if not closest:
                return acc | hit.astype(jnp.int32)
            ad_safe = jnp.where(ad > 1e-12, ad, 1.0)
            inv = pl.reciprocal(ad_safe, approx=True)
            inv = inv * (2.0 - ad_safe * inv)
            tb = pltpu.bitcast(jnp.maximum(ts * inv, 0.0), jnp.int32)
            key = (tb & jnp.int32(low_mask)) | (i << k_bits) | kid
            key = jnp.where(hit, key, jnp.int32(KEY_MISS))
            return jnp.minimum(acc, key)

        def body(i, carry):
            done, acc = carry
            new_acc = jax.lax.cond(
                done, lambda a: a, lambda a: compute(a, i), acc)

            def check(_):
                if closest:
                    nxt = trow[row, jnp.minimum(i + 1, mv - 1)]
                    per_ray = jnp.min(new_acc, axis=1)
                    best_hi = jnp.max(
                        jnp.where(dead[:, 0], 0, per_ray)) >> low_bits
                    return done | (best_hi < (nxt >> low_bits))
                return done | (jnp.min(jnp.max(new_acc, axis=1)) > 0)

            new_done = jax.lax.cond(
                jax.lax.rem(i, EVERY_N) == EVERY_N - 1,
                check, lambda _: done, 0)
            return (new_done, new_acc)

        _, finw = jax.lax.fori_loop(0, n, body, (n <= 0, acc0))
        if closest:
            fin = jnp.where(dead, 0, jnp.min(finw, axis=1, keepdims=True))
        else:
            fin = jnp.max(finw, axis=1, keepdims=True)
        out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


@partial(jax.jit, static_argnames=("k", "mv", "k_bits", "low_bits", "closest",
                                   "interpret", "precision"))
def visit_scan_instanced(rayblk, wnd, feats, sel_cl, minv12, nv, tnb, *,
                         k: int, mv: int, k_bits: int, low_bits: int,
                         closest: bool, interpret: bool = False,
                         precision: str = "high"):
    """rayblk: (T, 8, 128) f32 TRANSPOSED world rays [o(3), d(3), pad] —
    full-lane rows for the per-visit affine + feature build.
    wnd: (T, 128, 8) f32 ray-major window block, cols [t_min, t_max, pad] —
    (128,1) sublane slices for the hit predicates (t_max < t_min = dead).
    feats: (C,10,4K) object-space cluster coefficients (must fit VMEM).
    sel_cl: (T, mv) i32 GLOBAL cluster id per visit.
    minv12: (T, mv, 12) f32 world->object 3x4 rows per visit.
    nv: (T,) visit counts. tnb: (T, mv) i32 conservative world-entry-t bits
    (KEY_MISS pad) for the ordered early-out.

    Returns (T, 128) i32 packed winner keys / occlusion bits (dead lanes 0).
    Non-differentiable (guard upstream like visit_scan)."""
    import numpy as _np

    tiles = rayblk.shape[0]
    assert tiles % 8 == 0, tiles
    assert mv <= 128, mv
    feats16 = jnp.pad(feats, ((0, 0), (0, FR - feats.shape[1]), (0, 0)))
    assert feats16.size * 4 <= RESIDENT_BYTES, (
        "instanced Pallas kernel is VMEM-resident only; use the XLA path")
    selc0 = sel_cl[:, 0].astype(jnp.int32)
    mvp = 128
    pad2 = ((0, 0), (0, mvp - mv))
    selv = jnp.pad(sel_cl.astype(jnp.int32), pad2).reshape(tiles // 8, 8, mvp)
    tnbv = jnp.pad(tnb.astype(jnp.int32), pad2, constant_values=KEY_MISS
                   ).reshape(tiles // 8, 8, mvp)
    minvv = jnp.pad(minv12.astype(jnp.float32),
                    ((0, 0), (0, mvp - mv), (0, 0))
                    ).reshape(tiles // 8, 8, mvp * 12)

    @jax.custom_jvp
    def call(rayblk, wnd, feats16, selv, tnbv, minvv, selc0, nv):
        kernel = _make_kernel(k, mv, k_bits, low_bits, closest, precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((1, 8, RT), lambda t, s, n: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RT, 8), lambda t, s, n: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(feats16.shape, lambda t, s, n: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 8, RT), lambda t, s, n: (t // 8, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((8, mvp), jnp.int32),
                pltpu.SMEM((8, mvp), jnp.int32),
                pltpu.SMEM((8, mvp * 12), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tiles // 8, 8, RT), jnp.int32),
            interpret=interpret,
        )(selc0, nv, rayblk, wnd, selv, tnbv, minvv, feats16)
        return out.reshape(tiles, RT)

    @call.defjvp
    def _jvp(primals, tangents):
        out = call(*primals)
        return out, _np.zeros(out.shape, jax.dtypes.float0)

    return call(rayblk, wnd, feats16, selv, tnbv, minvv, selc0, nv)
