#!/usr/bin/env python
"""Round-4 lab 4: decode diet + unroll + check cadence, vs the production
wide-acc kernel. K=128, mv=C, sorted workloads (the production operating
point after commit b46e8e2).

closest variants:
  c0       production visit_scan (reference output + time)
  c1_diet  drop tmax test (radiance rays are scene-capped), drop the
           ad>eps guard + ad_safe where (degenerate dets self-reject via
           inf keys / failed ts>tmin*ad), min-trick predicates
  c2_u2    c1 + 2-visit unroll (amortize loop control)
  c3_u2c8  c2 + check cadence 8
occl variants:
  o0       production (cadence 4)
  o2       cadence 2 (occl_frac ~0.8: whole-tile done fires often)
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from lumenrenderer_tpu.accel import sorting as sorting_mod
from lumenrenderer_tpu.accel import tiled
from lumenrenderer_tpu.accel.stream import build_clusters, ray_features
from lumenrenderer_tpu.core import camera as camera_mod
from lumenrenderer_tpu.ops.pallas import intersect as pk
from lumenrenderer_tpu.scene import presets

RT, FR = 128, 16
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


def make_kernel(k, mv, k_bits, low_bits, closest, diet, unroll, cadence):
    low_mask = ~((1 << low_bits) - 1)

    def decode(res, tmin, tmax, i, kid):
        det = res[:, 0 * k:1 * k]
        un = res[:, 1 * k:2 * k]
        vn = res[:, 2 * k:3 * k]
        tn_ = res[:, 3 * k:4 * k]
        s = jnp.sign(det)
        ad = det * s
        us = un * s
        vs = vn * s
        ts = tn_ * s
        if diet:
            m = jnp.minimum(jnp.minimum(us, vs),
                            jnp.minimum(ad - (us + vs), ts - tmin * ad))
            hit = m >= 0.0
            if not closest:
                hit = hit & (ts <= tmax * ad) & (ad > 1e-12)
        else:
            hit = ((ad > 1e-12) & (us >= 0.0) & (vs >= 0.0) & (us + vs <= ad)
                   & (ts > tmin * ad) & (ts <= tmax * ad))
        if not closest:
            return hit, None
        if diet:
            inv = pl.reciprocal(ad, approx=True)  # deg dets -> inf key
            inv = inv * (2.0 - ad * inv)
        else:
            ad_safe = jnp.where(ad > 1e-12, ad, 1.0)
            inv = pl.reciprocal(ad_safe, approx=True)
            inv = inv * (2.0 - ad_safe * inv)
        tval = ts * inv
        tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
        # degenerate det -> tval inf/nan: nan bits are negative -> clamp
        if diet:
            tb = jnp.minimum(jnp.maximum(tb, 0), jnp.int32(KEY_MISS))
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
            acc0 = jnp.full((RT, k), KEY_MISS, jnp.int32)
        else:
            acc0 = jnp.broadcast_to(dead.astype(jnp.int32), (RT, k))

        def visit(i, acc):
            feats = feats_ref[srow[row, i]]
            hit, key = decode(_mt_res(feats, rfm), tmin, tmax, i, kid)
            if closest:
                return jnp.minimum(acc, key)
            return acc | hit.astype(jnp.int32)

        nit = (mv + unroll - 1) // unroll

        def body(it, carry):
            done, acc = carry
            i = it * unroll

            def comp(a):
                a = visit(i, a)
                for j in range(1, unroll):
                    def vj(a2, j=j):
                        return visit(i + j, a2)
                    a = jax.lax.cond(i + j < n, vj, lambda a2: a2, a)
                return a

            new_acc = jax.lax.cond(done, lambda a: a, comp, acc)

            def check(_):
                if closest:
                    nxt = trow[row, jnp.minimum(i + unroll, mv - 1)]
                    per_ray = jnp.min(new_acc, axis=1)
                    best_hi = jnp.max(
                        jnp.where(dead[:, 0], 0, per_ray)) >> low_bits
                    return done | (best_hi < (nxt >> low_bits))
                return done | (jnp.min(jnp.max(new_acc, axis=1)) > 0)

            new_done = jax.lax.cond(
                jax.lax.rem(i, cadence) >= cadence - unroll,
                check, lambda _: done, 0)
            return (new_done, new_acc)

        nit_live = (n + unroll - 1) // unroll
        _, finw = jax.lax.fori_loop(0, nit_live, body, (n <= 0, acc0))
        if closest:
            fin = jnp.where(dead, 0, jnp.min(finw, axis=1, keepdims=True))
        else:
            fin = jnp.max(finw, axis=1, keepdims=True)
        out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


def run_kernel(rf_t, feats16, sel, nv, tnb, k, mv, k_bits, low_bits,
               closest, diet, unroll, cadence):
    tiles = rf_t.shape[0]
    sel0 = sel[:, 0].astype(jnp.int32)
    mvp = 128
    pad = ((0, 0), (0, mvp - mv))
    selv = jnp.pad(sel.astype(jnp.int32), pad).reshape(tiles // 8, 8, mvp)
    tnbv = jnp.pad(tnb.astype(jnp.int32), pad, constant_values=KEY_MISS
                   ).reshape(tiles // 8, 8, mvp)
    kernel = make_kernel(k, mv, k_bits, low_bits, closest, diet, unroll,
                         cadence)
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
    mv = min(C, 128)
    print(f"tris={sc.num_triangles} K={K} C={C} mv={mv}", flush=True)

    key = jax.random.PRNGKey(0)
    ray_o, ray_d = camera_mod.generate_primary_rays(
        cam, W, H, jnp.int32(0), key=key, jitter="random")
    tn = jnp.full((N,), 1e-3, jnp.float32)
    tx = jnp.full((N,), 1e8, jnp.float32)
    tiles = N // RT

    hits = jax.jit(lambda o, d: tiled.intersect_closest(
        cs, o, d, jnp.float32(1e-3), tx, max_visits=mv,
        candidate_dtype="high", use_pallas=True, decode=False))(ray_o, ray_d)
    bo = ray_o + jnp.where(jnp.isfinite(hits["t"]), hits["t"], 1.0)[:, None] * ray_d
    ku = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3)) * 2 - 1
    bd = ku / jnp.linalg.norm(ku, axis=-1, keepdims=True)
    lo = jnp.min(sc.tri_pos.reshape(-1, 3), axis=0)
    hi = jnp.max(sc.tri_pos.reshape(-1, 3), axis=0)
    order = jnp.argsort(sorting_mod.ray_sort_key(bo, bd, lo, hi))
    bo_s, bd_s = bo[order], bd[order]

    lk = jax.random.fold_in(key, 7)
    nl = 64
    lcent = jax.random.uniform(lk, (nl, 3)) * 16 + 2
    lcent = lcent.at[:, 1].set(jax.random.uniform(
        jax.random.fold_in(lk, 1), (nl,)) * 7 + 12)
    pick = jax.random.randint(jax.random.fold_in(lk, 2), (N,), 0, nl)
    sdir = lcent[pick] - bo
    dist = jnp.linalg.norm(sdir, axis=-1)
    sdir = sdir / dist[:, None]
    stx = dist - 2e-3
    so = jnp.argsort(sorting_mod.capsule_sort_key(bo, sdir, stx, lo, hi))
    sho, shd, shtx = bo[so], sdir[so], stx[so]

    feats16 = jnp.pad(cs.tri_feat, ((0, 0), (0, FR - 10), (0, 0)))
    k_bits = max((K - 1).bit_length(), 1)
    s_bits = max((mv - 1).bit_length(), 1)
    low_bits = k_bits + s_bits

    cull = jax.jit(lambda o, d, tnn, txx: tiled._frustum_visits(
        cs, o, d, tnn, txx, tiles, mv))

    def inputs(o, d, tnn, txx):
        rf = ray_features(o, d)
        rf12 = jnp.concatenate([rf, tnn[:, None], txx[:, None]], axis=1)
        rf_t = rf12.reshape(tiles, RT, 12)
        selx, valx, tnearx, _ = cull(o, d, tnn, txx)
        nvx = jnp.sum(valx, axis=1).astype(jnp.int32)
        tb = jax.lax.bitcast_convert_type(
            jnp.maximum(tnearx, 0.0).astype(jnp.float32), jnp.int32)
        tnbx = jnp.where(valx, jnp.minimum(tb, KEY_MISS - 1),
                         jnp.int32(KEY_MISS))
        return rf_t, selx.astype(jnp.int32), nvx, tnbx

    for wname, args in (("primary", (ray_o, ray_d, tn, tx)),
                        ("bounce-sorted", (bo_s, bd_s, tn, tx))):
        rf_t, selx, nvx, tnbx = jax.block_until_ready(jax.jit(inputs)(*args))
        print(f"--- {wname} (visits {float(jnp.mean(nvx)):.1f})", flush=True)
        ref = None
        for name, (diet, unroll, cadence) in (
                ("c0", (False, 1, 4)), ("c1_diet", (True, 1, 4)),
                ("c2_u2", (True, 2, 4)), ("c3_u2c8", (True, 2, 8)),
                ("c4_u4c8", (True, 4, 8))):
            f = jax.jit(partial(run_kernel, k=K, mv=mv, k_bits=k_bits,
                                low_bits=low_bits, closest=True, diet=diet,
                                unroll=unroll, cadence=cadence))
            ms, out = timeit(f, rf_t, feats16, selx, nvx, tnbx)
            if ref is None:
                ref = out
                note = "(ref)"
            else:
                note = f"mismatch={int(jnp.sum(out != ref))}"
            print(f"  {name:9s} {ms:8.2f} ms {note}", flush=True)

    rf_t, selx, nvx, tnbx = jax.block_until_ready(
        jax.jit(inputs)(sho, shd, tn, shtx))
    print(f"--- shadow-sorted (visits {float(jnp.mean(nvx)):.1f})",
          flush=True)
    ref = None
    for name, (diet, unroll, cadence) in (
            ("o0", (False, 1, 4)), ("o1_diet", (True, 1, 4)),
            ("o2_c2", (True, 1, 2)), ("o3_u2c4", (True, 2, 4))):
        f = jax.jit(partial(run_kernel, k=K, mv=mv, k_bits=k_bits,
                            low_bits=low_bits, closest=False, diet=diet,
                            unroll=unroll, cadence=cadence))
        ms, out = timeit(f, rf_t, feats16, selx, nvx, tnbx)
        if ref is None:
            ref = out
            note = "(ref)"
        else:
            note = f"mismatch={int(jnp.sum(out != ref))}"
        print(f"  {name:9s} {ms:8.2f} ms {note}", flush=True)


if __name__ == "__main__":
    main()
