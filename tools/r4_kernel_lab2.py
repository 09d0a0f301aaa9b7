#!/usr/bin/env python
"""Round-4 kernel lab 2: decode-op reduction + early-out cadence + occlusion.

Variants (wide accumulator, VMEM-resident):
  w_base    wide acc, two-sided decode, check every 4     (lab1 v4)
  w_e2      ... check every 2
  w_bk      check backoff: visits 1,3,7,11,...            (i&1 with ramp)
  w_oneside one-sided (backface-cull) decode, check every 2
  w_nokey   closest WITHOUT polish (approx-reciprocal key), check every 2
  o_base    occlusion two-sided (production-style)
  o_cheap   occlusion wide-acc cheap decode (no key), check every 2
  o_oneside o_cheap + one-sided

Workloads: primary, bounce-sorted, shadow-sorted (NEE-style rays to random
lights, sorted), each with realistic t_max. Also: admission stats vs K.
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


def _mt_res(feats, rfm):  # 3-pass Dekker "high"
    dims = (((1,), (0,)), ((), ()))
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


def make_kernel(k, mv, k_bits, low_bits, variant):
    low_mask = ~((1 << low_bits) - 1)
    closest = variant.startswith("w_")
    oneside = "oneside" in variant
    polish = "nokey" not in variant
    if variant in ("w_base",):
        cadence = 4
    else:
        cadence = 2

    def hit_and_key(res, tmin, tmax, i, kid):
        det = res[:, 0 * k:1 * k]
        un = res[:, 1 * k:2 * k]
        vn = res[:, 2 * k:3 * k]
        tn_ = res[:, 3 * k:4 * k]
        if oneside:
            ad, us, vs, ts = det, un, vn, tn_
        else:
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
        if polish:
            inv = inv * (2.0 - ad_safe * inv)
        tval = ts * inv
        tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
        key = (tb & jnp.int32(low_mask)) | ((i << k_bits) | kid)
        return hit, jnp.where(hit, key, jnp.int32(KEY_MISS))

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

        if closest:
            accw0 = jnp.full((RT, k), KEY_MISS, jnp.int32)

            def body(i, carry):
                done, accw = carry

                def comp(a):
                    feats = feats_ref[srow[row, i]]
                    _, key = hit_and_key(_mt_res(feats, rfm), tmin, tmax, i,
                                         kid)
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
            if variant == "o_base":
                acc0 = dead.astype(jnp.int32)

                def body(i, carry):
                    done, acc = carry

                    def comp(a):
                        feats = feats_ref[srow[row, i]]
                        hit, _ = hit_and_key(_mt_res(feats, rfm), tmin, tmax,
                                             i, kid)
                        occ = jnp.any(hit, axis=1, keepdims=True)
                        return a | occ.astype(jnp.int32)

                    new_acc = jax.lax.cond(done, lambda a: a, comp, acc)
                    new_done = jax.lax.cond(
                        jax.lax.rem(i, cadence) == cadence - 1,
                        lambda _: done | (jnp.min(new_acc) > 0),
                        lambda _: done, 0)
                    return (new_done, new_acc)

                _, fin = jax.lax.fori_loop(0, n, body, (n <= 0, acc0))
                out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T
            else:
                accw0 = jnp.broadcast_to(dead, (RT, k))

                def body(i, carry):
                    done, accw = carry

                    def comp(a):
                        feats = feats_ref[srow[row, i]]
                        hit, _ = hit_and_key(_mt_res(feats, rfm), tmin, tmax,
                                             i, kid)
                        return a | hit

                    new_accw = jax.lax.cond(done, lambda a: a, comp, accw)

                    def check(_):
                        return done | jnp.all(jnp.any(new_accw, axis=1))

                    new_done = jax.lax.cond(
                        jax.lax.rem(i, cadence) == cadence - 1,
                        check, lambda _: done, 0)
                    return (new_done, new_accw)

                _, finw = jax.lax.fori_loop(0, n, body, (n <= 0, accw0))
                fin = jnp.any(finw, axis=1, keepdims=True)
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
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mv = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc, cam = scene.build(), camf(W / H)

    # ---- admission stats vs K for sorted bounce ----
    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tn = jnp.full((N,), 1e-3, jnp.float32)
    tx = jnp.full((N,), 1e8, jnp.float32)
    tiles = N // RT
    tmin_s = jnp.float32(1e-3)

    cs0 = build_clusters(sc.tri_pos, cluster_size=256)
    hits = jax.jit(lambda o, d: tiled.intersect_closest(
        cs0, o, d, tmin_s, tx, max_visits=24, candidate_dtype="high",
        use_pallas=True, decode=False))(ray_o, ray_d)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    order = jnp.argsort(sorting_mod.ray_sort_key(bo, bd, lo, hi))
    bo_s, bd_s = bo[order], bd[order]

    if len(sys.argv) > 3 and sys.argv[3] == "admit":
        for Kx in (256, 128, 64, 32):
            csx = build_clusters(sc.tri_pos, cluster_size=Kx)
            Cx = csx.num_clusters

            @jax.jit
            def stats(o, d, _cs=csx, _C=Cx):
                _, valid, _, _ = tiled._frustum_visits(
                    _cs, o, d, tn, tx, tiles, min(_C, 128))
                return jnp.sum(valid, axis=1)

            for nm, (o_, d_) in (("primary", (ray_o, ray_d)),
                                 ("bounce-sorted", (bo_s, bd_s))):
                nvx = stats(o_, d_)
                print(f"K={Kx:4d} C={Cx:5d} admit[{nm}]: "
                      f"mean={float(jnp.mean(nvx)):.1f} "
                      f"xtris={float(jnp.mean(nvx)) * Kx:.0f} "
                      f"p90={int(jnp.percentile(nvx, 90))} "
                      f"max={int(jnp.max(nvx))}", flush=True)
        return

    cs = build_clusters(sc.tri_pos, cluster_size=K)
    C = cs.num_clusters
    mv = min(mv, C)
    print(f"tris={sc.num_triangles} K={K} C={C} mv={mv}", flush=True)

    # shadow rays: from primary hit points toward random light positions
    lk = jax.random.fold_in(key, 7)
    lpos = jax.random.uniform(lk, (N, 3)) * 16 + 2
    lpos = lpos.at[:, 1].set(jax.random.uniform(
        jax.random.fold_in(lk, 1), (N,)) * 7 + 12)
    sdir = lpos - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3
    order_s = jnp.argsort(sorting_mod.ray_sort_key(bo, sdir, lo, hi))
    so_s, sd_s, stx_s = bo[order_s], sdir[order_s], stx[order_s]

    feats16 = jnp.pad(cs.tri_feat, ((0, 0), (0, FR - 10), (0, 0)))
    k_bits = max((K - 1).bit_length(), 1)
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits
    assert low_bits <= 15, (k_bits, s_bits)

    cull = jax.jit(lambda o, d, tnn, txx: tiled._frustum_visits(
        cs, o, d, tnn, txx, tiles, mv))

    def inputs(o, d, tnn, txx):
        rf = ray_features(o, d)
        rf12 = jnp.concatenate([rf, tnn[:, None], txx[:, None]], axis=1)
        rf_t = rf12.reshape(tiles, RT, 12)
        selx, valx, tnearx, ovf = cull(o, d, tnn, txx)
        nvx = jnp.sum(valx, axis=1).astype(jnp.int32)
        tb = jax.lax.bitcast_convert_type(
            jnp.maximum(tnearx, 0.0).astype(jnp.float32), jnp.int32)
        tnbx = jnp.where(valx, jnp.minimum(tb, KEY_MISS - 1),
                         jnp.int32(KEY_MISS))
        return rf_t, selx.astype(jnp.int32), nvx, tnbx, ovf

    workloads = [
        ("primary", (ray_o, ray_d, tn, tx),
         ("w_base", "w_e2", "w_oneside", "w_nokey")),
        ("bounce-sorted", (bo_s, bd_s, tn, tx),
         ("w_base", "w_e2", "w_oneside", "w_nokey")),
        ("shadow-sorted", (so_s, sd_s, tn, stx_s),
         ("o_base", "o_cheap", "o_oneside")),
    ]
    for wname, args, variants in workloads:
        rf_t, selx, nvx, tnbx, ovf = jax.jit(inputs)(*args)
        rf_t, selx, nvx, tnbx = jax.block_until_ready((rf_t, selx, nvx, tnbx))
        print(f"--- {wname}: mean visits {float(jnp.mean(nvx)):.1f} "
              f"overflow={bool(ovf)}", flush=True)
        ref = None
        for variant in variants:
            f = jax.jit(partial(run_kernel, k=K, mv=mv, k_bits=k_bits,
                                low_bits=low_bits, variant=variant))
            ms, out = timeit(f, rf_t, feats16, selx, nvx, tnbx)
            if ref is None:
                ref = out
                note = "(ref)"
            else:
                note = f"mismatch={int(jnp.sum(out != ref))}"
            print(f"  {variant:10s} {ms:8.2f} ms {note}", flush=True)


if __name__ == "__main__":
    main()
