"""Stage breakdown of tiled._query at bench scale."""
import time
from functools import partial
import jax, jax.numpy as jnp
from lumenrenderer_tpu.accel import stream, tiled
from lumenrenderer_tpu.accel.stream import ray_features
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets

W, H = 2560, 1440
scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
sc, cam = scene.build(), camf(W / H)
R = W * H
o, d = generate_primary_rays(cam, W, H, jnp.uint32(0), jitter="center")
cs = stream.build_clusters(sc.tri_pos, cluster_size=128)
C = cs.num_clusters
T = R // 128
mv = 16
k = 128
print("tris:", sc.num_triangles, "C:", C, "T:", T, flush=True)


def timeit(name, f, n=3):
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return r


tmin = jnp.full((R,), 1e-3)
tmax = jnp.full((R,), 1e9)


@jax.jit
def window_only(o, d, tn, tx):
    hit_rc, tnear_rc = tiled._ray_cluster_window(cs, o, d, tn, tx)
    hit_tc = jnp.any(hit_rc.reshape(T, 128, C), axis=1)
    tnear_tc = jnp.min(tnear_rc.reshape(T, 128, C), axis=1)
    tnear_tc = jnp.where(hit_tc, tnear_tc, jnp.inf)
    order = jnp.argsort(tnear_tc, axis=1)[:, :mv]
    valid_k = jnp.take_along_axis(hit_tc, order, axis=1)
    return order, valid_k


order, valid_k = timeit("window+order", lambda: window_only(o, d, tmin, tmax))


@jax.jit
def scan_only(o, d, tn, tx, order, valid_k):
    rf = ray_features(o, d).reshape(T, 128, 10)
    tmin_t = tn.reshape(T, 128)
    tmax_t = tx.reshape(T, 128)
    KEY_MISS = jnp.int32(0x7F000000)
    low_mask = jnp.int32(~((1 << 13) - 1))
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k), 2)
    step_ids = jnp.arange(mv, dtype=jnp.int32)

    def step(carry, inputs):
        best_key, occ = carry
        sel, ok_k, step_i = inputs
        feats = cs.tri_feat[sel]
        tid = cs.tri_id[sel]
        res = jnp.einsum("trf,tfc->trc", rf, feats,
                         preferred_element_type=jnp.float32)
        det = res[..., 0 * k:1 * k]
        okd = jnp.abs(det) > 1e-12
        inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
        u = res[..., 1 * k:2 * k] * inv
        v = res[..., 2 * k:3 * k] * inv
        t = res[..., 3 * k:4 * k] * inv
        hit = (okd & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (t > tmin_t[..., None]) & (t <= tmax_t[..., None])
               & (tid[:, None, :] >= 0) & ok_k[:, None, None])
        tb = jax.lax.bitcast_convert_type(jnp.maximum(t, 0.0), jnp.int32)
        key = (tb & low_mask) | (step_i << 7) | k_ids
        key = jnp.where(hit, key, KEY_MISS)
        best_key = jnp.minimum(best_key, jnp.min(key, axis=-1))
        occ = occ | jnp.any(hit, axis=-1)
        return (best_key, occ), None

    init = (jnp.full((T, 128), KEY_MISS, jnp.int32), jnp.zeros((T, 128), bool))
    (bk, occ), _ = jax.lax.scan(step, init, (order.T, valid_k.T, step_ids))
    return bk


timeit("scan(mv16)", lambda: scan_only(o, d, tmin, tmax, order, valid_k))


@jax.jit
def einsum_only(o, d, order):
    rf = ray_features(o, d).reshape(T, 128, 10)
    def step(acc, sel):
        feats = cs.tri_feat[sel]
        res = jnp.einsum("trf,tfc->trc", rf, feats,
                         preferred_element_type=jnp.float32)
        return jnp.minimum(acc, jnp.min(res, axis=-1)), None
    acc, _ = jax.lax.scan(step, jnp.full((T, 128), jnp.inf), order.T)
    return acc


timeit("einsum+gather only (mv16)", lambda: einsum_only(o, d, order))


@jax.jit
def einsum_nogather(o, d):
    rf = ray_features(o, d).reshape(T, 128, 10)
    feats0 = cs.tri_feat[:T]  # no gather: pretend contiguous
    def step(acc, i):
        res = jnp.einsum("trf,tfc->trc", rf, feats0,
                         preferred_element_type=jnp.float32)
        return jnp.minimum(acc, jnp.min(res, axis=-1)), None
    acc, _ = jax.lax.scan(step, jnp.full((T, 128), jnp.inf),
                          jnp.arange(mv))
    return acc


# need T <= C? no, tri_feat is (C,10,4K); take first T rows won't work if C<T.
# use broadcast instead
@jax.jit
def einsum_nogather2(o, d):
    rf = ray_features(o, d).reshape(T, 128, 10)
    feats0 = jnp.broadcast_to(cs.tri_feat[0], (T,) + cs.tri_feat.shape[1:])
    def step(acc, i):
        res = jnp.einsum("trf,tfc->trc", rf, feats0,
                         preferred_element_type=jnp.float32)
        return jnp.minimum(acc, jnp.min(res, axis=-1)), None
    acc, _ = jax.lax.scan(step, jnp.full((T, 128), jnp.inf),
                          jnp.arange(mv))
    return acc


timeit("einsum no-gather (mv16)", lambda: einsum_nogather2(o, d))

# single big einsum, no scan: (T,128,10)x(10, 4K*?) — all clusters at once
@jax.jit
def one_big(o, d):
    rf = ray_features(o, d).reshape(-1, 10)           # (R,10)
    allfeat = cs.tri_feat.transpose(1, 0, 2).reshape(10, -1)  # (10, C*4K)
    res = rf @ allfeat                                 # (R, C*4K)
    return jnp.min(res, axis=-1)


timeit(f"ONE dense matmul R x {C*4*k}", lambda: one_big(o, d))
