"""Bisect the closest-kernel epilogue cost (standalone kernel variants)."""
import time
from functools import partial

import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.accel.stream import ray_features
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

KEY_MISS = 0x7F000000
RT, FR, NBUF = 128, 16, 6

W, H = 2560, 1440
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
R = W * H
o, d = generate_primary_rays(cam, W, H, jnp.uint32(0), jitter="center")

K = 128
mv = 16
cs = stream.build_clusters(sc.tri_pos, cluster_size=K)


def make_kernel(k, variant):
    def kernel(sel0_ref, nv_ref, rf_ref, selv_ref, tnbv_ref, first_ref,
               feats_ref, out_ref, fbuf, sems, srow, trow, rsem):
        t = pl.program_id(0)
        row = jax.lax.rem(t, 8)
        n = nv_ref[t]
        rf = rf_ref[0]
        rfm = rf[:, :10]
        tmin = rf[:, 10:11]
        tmax = rf[:, 11:12]

        @pl.when(row == 0)
        def _():
            cps = pltpu.make_async_copy(selv_ref.at[t // 8], srow, rsem.at[0])
            cpt = pltpu.make_async_copy(tnbv_ref.at[t // 8], trow, rsem.at[1])
            cps.start(); cpt.start(); cps.wait(); cpt.wait()

        def dma(i):
            slot = jax.lax.rem(i - 1, NBUF)
            return pltpu.make_async_copy(
                feats_ref.at[srow[row, i]], fbuf.at[slot], sems.at[slot])

        for j in range(1, NBUF + 1):
            @pl.when(n > j)
            def _(j=j):
                dma(j).start()

        acc0 = jnp.full((RT, 1), KEY_MISS, jnp.int32)
        kid = jax.lax.broadcasted_iota(jnp.int32, (RT, k), 1)

        def body(i, acc):
            @pl.when(i > 0)
            def _():
                dma(i).wait()
            slot = jax.lax.rem(jnp.maximum(i - 1, 0), NBUF)
            feats = jnp.where(i == 0, first_ref[0], fbuf[slot])
            res = jax.lax.dot_general(
                rfm, feats[:10], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
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
            if variant == "anyhit":
                occ = jnp.any(hit, axis=1, keepdims=True)
                acc = acc | occ.astype(jnp.int32)
            elif variant == "ts_min":
                # no recip/bitcast/key: min of raw ts (wrong but same shape)
                v = jnp.where(hit, ts, 3e37)
                acc = jnp.minimum(acc, jnp.min(v, axis=1, keepdims=True
                                               ).astype(jnp.int32))
            elif variant == "recip":
                tval = ts * pl.reciprocal(jnp.where(ad > 1e-12, ad, 1.0),
                                          approx=False)
                v = jnp.where(hit, tval, 3e37)
                acc = jnp.minimum(acc, jnp.min(v, axis=1, keepdims=True
                                               ).astype(jnp.int32))
            elif variant == "recap":
                tval = ts * pl.reciprocal(jnp.where(ad > 1e-12, ad, 1.0),
                                          approx=True)
                v = jnp.where(hit, tval, 3e37)
                acc = jnp.minimum(acc, jnp.min(v, axis=1, keepdims=True
                                               ).astype(jnp.int32))
            elif variant == "bitcast":
                tval = ts * pl.reciprocal(jnp.where(ad > 1e-12, ad, 1.0),
                                          approx=False)
                tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
                key = jnp.where(hit, tb, jnp.int32(KEY_MISS))
                acc = jnp.minimum(acc, jnp.min(key, axis=1, keepdims=True))
            elif variant == "full":
                tval = ts * pl.reciprocal(jnp.where(ad > 1e-12, ad, 1.0),
                                          approx=False)
                tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
                key = (tb & jnp.int32(~0x1FFF)) | (i << 7) | kid
                key = jnp.where(hit, key, jnp.int32(KEY_MISS))
                acc = jnp.minimum(acc, jnp.min(key, axis=1, keepdims=True))
            elif variant == "nosplat":
                # like full but without the dynamic (i << 7) scalar splat
                tval = ts * pl.reciprocal(jnp.where(ad > 1e-12, ad, 1.0),
                                          approx=False)
                tb = pltpu.bitcast(jnp.maximum(tval, 0.0), jnp.int32)
                key = (tb & jnp.int32(~0x1FFF)) | kid
                key = jnp.where(hit, key, jnp.int32(KEY_MISS))
                acc = jnp.minimum(acc, jnp.min(key, axis=1, keepdims=True))
            @pl.when((i >= 1) & (i + NBUF < n))
            def _():
                dma(i + NBUF).start()
            return acc

        acc = jax.lax.fori_loop(0, n, body, acc0)
        out_ref[0] = acc

    return kernel


@partial(jax.jit, static_argnames=("variant",))
def run(rf_t, feats16, sel0, nv, selv, tnbv, variant):
    tiles = rf_t.shape[0]
    fk = feats16.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, RT, 12), lambda t, s, n: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, FR, fk), lambda t, s, n: (s[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, RT, 1), lambda t, s, n: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FR, fk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SMEM((8, 128), jnp.int32),
            pltpu.SMEM((8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        make_kernel(K, variant), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles, RT, 1), jnp.int32),
    )(sel0, nv, rf_t, selv, tnbv, feats16, feats16)


# build inputs once (outside timer)
r = R
tn = jnp.full((r,), 1e-3)
tx = jnp.full((r,), 1e9)
tiles = r // 128
order, valid, tnear, ovf = tiled._frustum_visits(cs, o, d, tn, tx, tiles, mv)
rf12 = jnp.concatenate([ray_features(o, d), tn[:, None], tx[:, None]], axis=1)
rf_t = rf12.reshape(tiles, 128, 12)
sel0 = order[:, 0].astype(jnp.int32)
nv = jnp.sum(valid, axis=1).astype(jnp.int32)
tnb = jnp.where(valid, jnp.int32(1), jnp.int32(KEY_MISS))
pad = ((0, 0), (0, 128 - mv))
selv = jnp.pad(order.astype(jnp.int32), pad).reshape(tiles // 8, 8, 128)
tnbv = jnp.pad(tnb, pad, constant_values=KEY_MISS).reshape(tiles // 8, 8, 128)
feats16 = jnp.pad(cs.tri_feat, ((0, 0), (0, 6), (0, 0)))
feats16, rf_t, sel0, nv, selv, tnbv = jax.block_until_ready(
    (feats16, rf_t, sel0, nv, selv, tnbv))
print("mean visits:", float(jnp.mean(nv)), flush=True)


def timeit(name, f, n=5):
    x = f(); jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n): x = f()
    jax.block_until_ready(x)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)


for v in ("anyhit", "ts_min", "recip", "recap", "bitcast", "nosplat", "full"):
    timeit(v, lambda v=v: run(rf_t, feats16, sel0, nv, selv, tnbv, v))
