#!/usr/bin/env python
"""Round-4 kernel lab: ablate the visit kernel's per-visit fixed cost.

Variants (all VMEM-resident, K=256 bench shape, realistic visit lists from
the real culling on real primary/bounce rays):

  v0_prod      production visit_scan (cond'd compute, per-visit lane-min,
               ordered early-out every 4)
  v1_wide      wide (128,4K) key accumulator: per-visit work is ONE
               elementwise min; cross-lane reduce ONCE after the loop;
               no early-out
  v2_nocond    production accumulator but no lax.cond/early-out (straight
               fori over n)
  v3_mmonly    matmul only (decode stripped) — lower bound for the MXU share
  v4_widecheck v1 + early-out check every 4 on the wide accumulator

Also prints: per-tile visit-count stats for raw vs SORTED bounce rays (the
sort_secondary win), and culling-stage cost.
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


def _mt_res(feats, rfm, precision):
    dims = (((1,), (0,)), ((), ()))
    if precision == "high":
        f10 = feats[:10]
        f_hi = f10.astype(jnp.bfloat16)
        f_lo = (f10 - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_hi = rfm.astype(jnp.bfloat16)
        r_lo = (rfm - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jax.lax.dot_general(r_hi, f_hi, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(r_hi, f_lo, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(r_lo, f_hi, dimension_numbers=dims,
                                  preferred_element_type=jnp.float32)
        )
    return jax.lax.dot_general(
        rfm, feats[:10], dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision={"highest": jax.lax.Precision.HIGHEST,
                   "default": jax.lax.Precision.DEFAULT}[precision])


def make_variant(k, mv, k_bits, low_bits, precision, variant):
    low_mask = ~((1 << low_bits) - 1)

    def decode_key(res, rfm, tmin, tmax, i, kid):
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
        ad_safe = jnp.where(ad > 1e-12, ad, 1.0)
        inv = pl.reciprocal(ad_safe, approx=True)
        inv = inv * (2.0 - ad_safe * inv)
        tval = ts * inv
        tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
        key = (tb & jnp.int32(low_mask)) | (i << k_bits) | kid
        return jnp.where(hit, key, jnp.int32(KEY_MISS))

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

        if variant == "v0_prod":
            acc0 = jnp.where(dead, 0, KEY_MISS).astype(jnp.int32)

            def body(i, carry):
                done, acc = carry
                feats = feats_ref[srow[row, i]]

                def comp(a):
                    key = decode_key(_mt_res(feats, rfm, precision), rfm,
                                     tmin, tmax, i, kid)
                    return jnp.minimum(a, jnp.min(key, axis=1, keepdims=True))

                new_acc = jax.lax.cond(done, lambda a: a, comp, acc)

                def check(_):
                    nxt = trow[row, jnp.minimum(i + 1, mv - 1)]
                    best_hi = jnp.max(new_acc) >> low_bits
                    return done | (best_hi < (nxt >> low_bits))

                new_done = jax.lax.cond(
                    jax.lax.rem(i, 4) == 3, check, lambda _: done, 0)
                return (new_done, new_acc)

            _, fin = jax.lax.fori_loop(0, n, body, (n <= 0, acc0))
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

        elif variant == "v2_nocond":
            acc0 = jnp.where(dead, 0, KEY_MISS).astype(jnp.int32)

            def body(i, acc):
                feats = feats_ref[srow[row, i]]
                key = decode_key(_mt_res(feats, rfm, precision), rfm,
                                 tmin, tmax, i, kid)
                return jnp.minimum(acc, jnp.min(key, axis=1, keepdims=True))

            fin = jax.lax.fori_loop(0, n, body, acc0)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

        elif variant in ("v1_wide", "v4_widecheck"):
            accw0 = jnp.full((RT, k), KEY_MISS, jnp.int32)

            if variant == "v1_wide":
                def body(i, accw):
                    feats = feats_ref[srow[row, i]]
                    key = decode_key(_mt_res(feats, rfm, precision), rfm,
                                     tmin, tmax, i, kid)
                    return jnp.minimum(accw, key)

                finw = jax.lax.fori_loop(0, n, body, accw0)
            else:
                def body(i, carry):
                    done, accw = carry

                    def comp(a):
                        feats = feats_ref[srow[row, i]]
                        key = decode_key(_mt_res(feats, rfm, precision), rfm,
                                         tmin, tmax, i, kid)
                        return jnp.minimum(a, key)

                    new_accw = jax.lax.cond(done, lambda a: a, comp, accw)

                    def check(_):
                        nxt = trow[row, jnp.minimum(i + 1, mv - 1)]
                        per_ray = jnp.min(new_accw, axis=1)
                        best_hi = jnp.max(
                            jnp.where(dead[:, 0], 0, per_ray)) >> low_bits
                        return done | (best_hi < (nxt >> low_bits))

                    new_done = jax.lax.cond(
                        jax.lax.rem(i, 4) == 3, check, lambda _: done, 0)
                    return (new_done, new_accw)

                _, finw = jax.lax.fori_loop(0, n, body, (n <= 0, accw0))
            fin = jnp.min(finw, axis=1, keepdims=True)
            fin = jnp.where(dead, 0, fin)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

        elif variant == "v3_mmonly":
            acc0 = jnp.zeros((RT, 1), jnp.float32)

            def body(i, acc):
                feats = feats_ref[srow[row, i]]
                res = _mt_res(feats, rfm, precision)
                return acc + res[:, :1]

            fin = jax.lax.fori_loop(0, n, body, acc0)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


def run_variant(rf_t, feats16, sel, nv, tnb, k, mv, k_bits, low_bits,
                precision, variant):
    tiles = rf_t.shape[0]
    sel0 = sel[:, 0].astype(jnp.int32)
    mvp = 128
    pad = ((0, 0), (0, mvp - mv))
    selv = jnp.pad(sel.astype(jnp.int32), pad).reshape(tiles // 8, 8, mvp)
    tnbv = jnp.pad(tnb.astype(jnp.int32), pad, constant_values=KEY_MISS
                   ).reshape(tiles // 8, 8, mvp)
    kernel = make_variant(k, mv, k_bits, low_bits, precision, variant)
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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mv = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)
    cs = build_clusters(sc.tri_pos, cluster_size=K)
    C = cs.num_clusters
    print(f"tris={sc.num_triangles} K={K} C={C} mv={mv}", flush=True)

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tmin_s = jnp.float32(1e-3)
    tn = jnp.full((N,), 1e-3, jnp.float32)
    tx = jnp.full((N,), 1e8, jnp.float32)
    tiles = N // RT

    # primary hits for bounce origins
    hits = jax.jit(lambda o, d: tiled.intersect_closest(
        cs, o, d, tmin_s, tx, max_visits=mv, candidate_dtype="high",
        use_pallas=True, decode=False))(ray_o, ray_d)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)

    # sorted bounce rays
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    skey = sorting_mod.ray_sort_key(bo, bd, lo, hi)
    order = jnp.argsort(skey)
    bo_s, bd_s = bo[order], bd[order]

    # visit-count stats via the dense exact per-ray union and the frusta
    @jax.jit
    def admit_stats(o, d):
        hit_tc, _, _, _ = None, None, None, None
        idx, valid, tnear, ovf = tiled._frustum_visits(
            cs, o, d, tn, tx, tiles, min(C, 128))
        return jnp.sum(valid, axis=1)

    for name, (o_, d_) in (("primary", (ray_o, ray_d)),
                           ("bounce-raw", (bo, bd)),
                           ("bounce-sorted", (bo_s, bd_s))):
        nvx = admit_stats(o_, d_)
        print(f"admit[{name}]: mean={float(jnp.mean(nvx)):.1f} "
              f"p50={int(jnp.percentile(nvx, 50))} "
              f"p90={int(jnp.percentile(nvx, 90))} "
              f"p99={int(jnp.percentile(nvx, 99))} max={int(jnp.max(nvx))}",
              flush=True)

    # culling-stage cost alone
    cull = jax.jit(lambda o, d: tiled._frustum_visits(cs, o, d, tn, tx,
                                                      tiles, mv))
    ms_cull, (sel_p, val_p, tnear_p, _) = timeit(cull, ray_o, ray_d)
    print(f"culling(frustum) = {ms_cull:.2f} ms", flush=True)

    # build kernel inputs for primary and sorted-bounce
    feats16 = jnp.pad(cs.tri_feat, ((0, 0), (0, FR - 10), (0, 0)))
    k_bits = max((K - 1).bit_length(), 1)
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits

    def inputs(o, d):
        rf = ray_features(o, d)
        rf12 = jnp.concatenate([rf, tn[:, None], tx[:, None]], axis=1)
        rf_t = rf12.reshape(tiles, RT, 12)
        selx, valx, tnearx, _ = cull(o, d)
        nvx = jnp.sum(valx, axis=1).astype(jnp.int32)
        tb = jax.lax.bitcast_convert_type(
            jnp.maximum(tnearx, 0.0).astype(jnp.float32), jnp.int32)
        tnbx = jnp.where(valx, jnp.minimum(tb, KEY_MISS - 1),
                         jnp.int32(KEY_MISS))
        return rf_t, selx.astype(jnp.int32), nvx, tnbx

    for wname, (o_, d_) in (("primary", (ray_o, ray_d)),
                            ("bounce-sorted", (bo_s, bd_s)),
                            ("bounce-raw", (bo, bd))):
        rf_t, selx, nvx, tnbx = jax.jit(inputs)(o_, d_)
        rf_t, selx, nvx, tnbx = jax.block_until_ready(
            (rf_t, selx, nvx, tnbx))
        print(f"--- workload {wname}: mean visits "
              f"{float(jnp.mean(nvx)):.1f}", flush=True)
        ref = None
        for variant in ("v0_prod", "v2_nocond", "v1_wide", "v4_widecheck",
                        "v3_mmonly"):
            for prec in ("high",):
                f = jax.jit(partial(run_variant, k=K, mv=mv, k_bits=k_bits,
                                    low_bits=low_bits, precision=prec,
                                    variant=variant))
                ms, out = timeit(f, rf_t, feats16, selx, nvx, tnbx)
                note = ""
                if variant in ("v0_prod", "v2_nocond", "v1_wide",
                               "v4_widecheck"):
                    if ref is None:
                        ref = out
                        note = "(ref)"
                    else:
                        mism = int(jnp.sum(out != ref))
                        note = f"mismatch={mism}"
                print(f"  {variant:12s} {prec:6s} {ms:8.2f} ms {note}",
                      flush=True)


if __name__ == "__main__":
    main()
