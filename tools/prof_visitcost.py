#!/usr/bin/env python
"""Microbench the Pallas visit_scan kernel: per-visit cost vs per-program
overhead, by forcing uniform visit counts nv = 1..mv on synthetic data."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from lumenrenderer_tpu.ops.pallas import intersect as pk

N = 2560 * 1440
RT = 128
TILES = N // RT  # 28800


def bench(k, mv, nv_val, closest=True, reps=5):
    c = max(64, nv_val + 1)
    keyr = jax.random.PRNGKey(0)
    rf_t = jax.random.normal(keyr, (TILES, RT, 12), jnp.float32)
    rf_t = rf_t.at[:, :, 10].set(0.0).at[:, :, 11].set(1e8)
    feats = jax.random.normal(keyr, (c, 10, 4 * k), jnp.float32)
    tri_id = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (c, 1))
    sel = jnp.tile(jnp.arange(mv, dtype=jnp.int32)[None] % c, (TILES, 1))
    nv = jnp.full((TILES,), nv_val, jnp.int32)
    tnb = jnp.zeros((TILES, mv), jnp.int32)  # entry t=0 -> no early-out
    k_bits = max((k - 1).bit_length(), 1)
    s_bits = max((mv - 1).bit_length(), 1)

    fn = jax.jit(lambda *a: pk.visit_scan(
        *a, k=k, mv=mv, k_bits=k_bits, low_bits=k_bits + s_bits,
        closest=closest, interpret=False))
    args = (rf_t, feats, tri_id, sel, nv, tnb)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    cand = TILES * nv_val * 4 * k
    print(f"k={k:4d} mv={mv:2d} nv={nv_val:2d} closest={closest!s:5s} "
          f"{dt:8.2f} ms   {cand/1e6:7.0f}M cand  {dt*1e6/cand*1000:6.2f} ns/cand")
    return dt


if __name__ == "__main__":
    print(f"tiles={TILES}")
    for nv in (1, 2, 4, 8, 12):
        bench(256, 12, nv)
    print("--- cluster size sweep (nv=4) ---")
    for k in (64, 128, 256, 512):
        bench(k, 12, 4)
    print("--- occlusion ---")
    bench(256, 12, 4, closest=False)
