#!/usr/bin/env python
"""Round-4 lab 3: shadow-ray sort keys + occlusion kernel + no-overflow mv.

- endpoint-aware sort for shadow rays: key = morton(origin)<<12 | morton(end)
  (tiles become tight origin->light capsules) vs the octant|origin key.
- occlusion wide-acc kernel with arithmetic (int) reduces in the check.
- bounce closest at mv=C (zero overflow) to price the no-truncation bar.
- argsort + gather overhead of the sorting wrapper itself.
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import tiled
from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import morton as morton_mod
from lumenrenderer_tpu.accel.stream import build_clusters, ray_features
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.scene import presets

RT = 128
FR = 16
W, H = 2560, 1440
N = W * H
KEY_MISS = 0x7F000000


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def _mt_res(feats, rfm):
    dims = (((1,), (0,)), ((), ()))
    f10 = feats[:10]
    f_hi = f10.astype(jnp.bfloat16)
    f_lo = (f10 - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    r_hi = rfm.astype(jnp.bfloat16)
    r_lo = (rfm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jax.lax.dot_general(r_hi, f_hi, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(r_hi, f_lo, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(r_lo, f_hi, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32))


def make_kernel(k, mv, k_bits, low_bits, variant, cadence=4):
    low_mask = ~((1 << low_bits) - 1)
    closest = variant.startswith("w_")

    def kernel(sel0_ref, nv_ref, rf_ref, selv_ref, tnbv_ref, feats_ref,
               out_ref, srow, trow, rsem):
        t = pl.program_id(0)
        row = jax.lax.rem(t, 8)
        n = nv_ref[t]
        rf = rf_ref[0]
        rfm = rf[:, :10]
        tmin = rf[:, 10:11]
        tmax = rf[:, 11:12]
        dead = tmax < tmin

        @pl.when(row == 0)
        def _():
            cps = pltpu.make_async_copy(selv_ref.at[t // 8], srow, rsem.at[0])
            cpt = pltpu.make_async_copy(tnbv_ref.at[t // 8], trow, rsem.at[1])
            cps.start()
            cpt.start()
            cps.wait()
            cpt.wait()

        kid = jax.lax.broadcasted_iota(jnp.int32, (RT, k), 1)

        def decode(res, i):
            det = res[:, 0 * k:1 * k]
            un = res[:, 1 * k:2 * k]
            vn = res[:, 2 * k:3 * k]
            tn_ = res[:, 3 * k:4 * k]
            s = jnp.sign(det)
            ad = det * s
            us = un * s
            vs = vn * s
            ts = tn_ * s
            hit = ((ad > 1e-12) & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
                   & (ts > tmin * ad) & (ts <= tmax * ad))
            if not closest:
                return hit, None
            ad_safe = jnp.where(ad > 1e-12, ad, 1.0)
            inv = pl.reciprocal(ad_safe, approx=True)
            inv = inv * (2.0 - ad_safe * inv)
            tb = pltpu.bitcast(jnp.maximum(ts * inv, 0.0), jnp.int32)
            key = (tb & jnp.int32(low_mask)) | ((i << k_bits) | kid)
            return hit, jnp.where(hit, key, jnp.int32(KEY_MISS))

        if closest:
            accw0 = jnp.full((RT, k), KEY_MISS, jnp.int32)

            def body(i, carry):
                done, accw = carry

                def comp(a):
                    feats = feats_ref[srow[row, i]]
                    _, key = decode(_mt_res(feats, rfm), i)
                    return jnp.minimum(a, key)

                new_accw = jax.lax.cond(done, lambda a: a, comp, accw)

                def check(_):
                    nxt = trow[row, jnp.minimum(i + 1, mv - 1)]
                    per_ray = jnp.min(new_accw, axis=1)
                    best_hi = jnp.max(
                        jnp.where(dead[:, 0], 0, per_ray)) >> low_bits
                    return done | (best_hi < (nxt >> low_bits))

                new_done = jax.lax.cond(
                    jax.lax.rem(i, cadence) == cadence - 1,
                    check, lambda _: done, 0)
                return (new_done, new_accw)

            _, finw = jax.lax.fori_loop(0, n, body, (n <= 0, accw0))
            fin = jnp.min(finw, axis=1, keepdims=True)
            fin = jnp.where(dead, 0, fin)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T
        else:
            # occlusion: int32 wide accumulator, arithmetic reduces only
            accw0 = jnp.broadcast_to(dead.astype(jnp.int32), (RT, k))

            def body(i, carry):
                done, accw = carry

                def comp(a):
                    feats = feats_ref[srow[row, i]]
                    hit, _ = decode(_mt_res(feats, rfm), i)
                    return a | hit.astype(jnp.int32)

                new_accw = jax.lax.cond(done, lambda a: a, comp, accw)

                def check(_):
                    per_ray = jnp.max(new_accw, axis=1)  # any along lanes
                    return done | (jnp.min(per_ray) > 0)  # all rays occluded

                new_done = jax.lax.cond(
                    jax.lax.rem(i, cadence) == cadence - 1,
                    check, lambda _: done, 0)
                return (new_done, new_accw)

            _, finw = jax.lax.fori_loop(0, n, body, (n <= 0, accw0))
            fin = jnp.max(finw, axis=1, keepdims=True)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


def run_kernel(rf_t, feats16, sel, nv, tnb, k, mv, k_bits, low_bits, variant):
    tiles = rf_t.shape[0]
    sel0 = sel[:, 0].astype(jnp.int32)
    mvp = 128
    pad = ((0, 0), (0, mvp - mv))
    selv = jnp.pad(sel.astype(jnp.int32), pad).reshape(tiles // 8, 8, mvp)
    tnbv = jnp.pad(tnb.astype(jnp.int32), pad, constant_values=KEY_MISS
                   ).reshape(tiles // 8, 8, mvp)
    kernel = make_kernel(k, mv, k_bits, low_bits, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, RT, 12), lambda t, sel0, nv: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(feats16.shape, lambda t, sel0, nv: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, RT), lambda t, sel0, nv: (t // 8, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((8, mvp), jnp.int32),
            pltpu.SMEM((8, mvp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles // 8, 8, RT), jnp.int32),
    )(sel0, nv, rf_t, selv, tnbv, feats16).reshape(tiles, RT)


def main():
    K = 128
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    cs = build_clusters(sc.tri_pos, cluster_size=K)
    C = cs.num_clusters
    print(f"tris={sc.num_triangles} K={K} C={C}", flush=True)

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tn = jnp.full((N,), 1e-3, jnp.float32)
    tx = jnp.full((N,), 1e8, jnp.float32)
    tiles = N // RT
    tmin_s = jnp.float32(1e-3)

    hits = jax.jit(lambda o, d: tiled.intersect_closest(
        cs, o, d, tmin_s, tx, max_visits=24, candidate_dtype="high",
        use_pallas=True, decode=False))(ray_o, ray_d)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)

    # shadow rays: toward one of 64 actual light panel positions
    lk = jax.random.fold_in(key, 7)
    nl = 64
    lcent = jax.random.uniform(lk, (nl, 3)) * 16 + 2
    lcent = lcent.at[:, 1].set(
        jax.random.uniform(jax.random.fold_in(lk, 1), (nl,)) * 7 + 12)
    pick = jax.random.randint(jax.random.fold_in(lk, 2), (N,), 0, nl)
    lpos = lcent[pick]
    sdir = lpos - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3

    def sort_by(key_arr, o, d, txx):
        order = jnp.argsort(key_arr)
        return o[order], d[order], txx[order]

    key_oct = sorting_mod.ray_sort_key(bo, sdir, lo, hi)
    end = bo + sdir * (stx[:, None])
    m_o = morton_mod.morton3d(bo, lo, hi) >> 18   # top 12 bits
    m_e = morton_mod.morton3d(end, lo, hi) >> 18
    key_cap = (m_o << 12) | m_e

    cull = jax.jit(lambda o, d, tnn, txx, mv: tiled._frustum_visits(
        cs, o, d, tnn, txx, tiles, mv), static_argnums=(4,))

    for nm, karr in (("octant|morton", key_oct), ("capsule o|end", key_cap)):
        o_s, d_s, tx_s = jax.jit(sort_by)(karr, bo, sdir, stx)
        _, valid, _, _ = cull(o_s, d_s, tn, tx_s, C)
        nvx = jnp.sum(valid, axis=1)
        print(f"shadow admit [{nm}]: mean={float(jnp.mean(nvx)):.1f} "
              f"p90={int(jnp.percentile(nvx, 90))} max={int(jnp.max(nvx))}",
              flush=True)

    k_bits = max((K - 1).bit_length(), 1)
    feats16 = jnp.pad(cs.tri_feat, ((0, 0), (0, FR - 10), (0, 0)))

    def inputs(o, d, tnn, txx, mv):
        rf = ray_features(o, d)
        rf12 = jnp.concatenate([rf, tnn[:, None], txx[:, None]], axis=1)
        rf_t = rf12.reshape(tiles, RT, 12)
        selx, valx, tnearx, ovf = cull(o, d, tnn, txx, mv)
        nvx = jnp.sum(valx, axis=1).astype(jnp.int32)
        tb = jax.lax.bitcast_convert_type(
            jnp.maximum(tnearx, 0.0).astype(jnp.float32), jnp.int32)
        tnbx = jnp.where(valx, jnp.minimum(tb, KEY_MISS - 1),
                         jnp.int32(KEY_MISS))
        return rf_t, selx.astype(jnp.int32), nvx, tnbx, ovf

    # --- occlusion kernel on both shadow sorts, mv=C (no overflow) ---
    mv = C
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits
    assert low_bits <= 15
    for nm, karr in (("octant", key_oct), ("capsule", key_cap)):
        o_s, d_s, tx_s = jax.jit(sort_by)(karr, bo, sdir, stx)
        rf_t, selx, nvx, tnbx, ovf = jax.jit(
            partial(inputs, mv=mv))(o_s, d_s, tn, tx_s)
        jax.block_until_ready(rf_t)
        f = jax.jit(partial(run_kernel, k=K, mv=mv, k_bits=k_bits,
                            low_bits=low_bits, variant="o_wide"))
        ms, out = timeit(f, rf_t, feats16, selx, nvx, tnbx)
        print(f"occl[{nm}] mv={mv} visits={float(jnp.mean(nvx)):.1f} "
              f"ovf={bool(ovf)}: {ms:.2f} ms occl_frac="
              f"{float(jnp.mean((out > 0) * 1.0)):.3f}", flush=True)

    # --- bounce closest at mv=C: the no-overflow price ---
    key_b = sorting_mod.ray_sort_key(bo, bd, lo, hi)
    bo_s, bd_s, _ = jax.jit(sort_by)(key_b, bo, bd, tx)
    rf_t, selx, nvx, tnbx, ovf = jax.jit(
        partial(inputs, mv=mv))(bo_s, bd_s, tn, tx)
    jax.block_until_ready(rf_t)
    f = jax.jit(partial(run_kernel, k=K, mv=mv, k_bits=k_bits,
                        low_bits=low_bits, variant="w_wide"))
    ms, _ = timeit(f, rf_t, feats16, selx, nvx, tnbx)
    print(f"bounce-sorted closest mv={mv} visits={float(jnp.mean(nvx)):.1f} "
          f"ovf={bool(ovf)}: {ms:.2f} ms", flush=True)

    # --- sorting wrapper overhead itself ---
    def sort_cost(o, d, txx):
        karr = sorting_mod.ray_sort_key(o, d, lo, hi)
        order = jnp.argsort(karr)
        packed = jnp.concatenate([o, d, txx[:, None]], axis=1)[order]
        inv = jnp.argsort(order)
        # simulate unsort of a result
        back = packed[:, 0][inv]
        return back
    ms, _ = timeit(jax.jit(sort_cost), bo, bd, tx)
    print(f"sort+unsort overhead: {ms:.2f} ms", flush=True)

    # culling cost at mv=C
    ms, _ = timeit(jax.jit(partial(inputs, mv=mv)), bo_s, bd_s, tn, tx)
    print(f"culling+inputs mv={mv}: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
