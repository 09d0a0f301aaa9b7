#!/usr/bin/env python
"""Round-3 experiment: light-selection sampler cost at bench scale.

A/B at N=3.7M rays, L=64 lights:
  uniform            — round-1 default
  cdf-searchsorted   — round-2 default (the +1140ms/frame regression)
  cdf-onehot         — selection + all light data via ONE (R,L) one-hot matmul
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

N = int(os.environ.get("N", 2560 * 1440))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:44s} {dt:9.3f} ms")
    return dt


def main():
    from lumenrenderer_tpu.integrator import nee as nee_mod
    from lumenrenderer_tpu.scene import presets

    scene, camf = presets.interior_scene(n_boxes=600, n_lights=64)
    sc = scene.build()
    rad_all = nee_mod.all_light_radiance(sc)
    cdf, sel_pdf = nee_mod.build_light_cdf(sc, rad_all)
    cdf, sel_pdf, rad_all = jax.block_until_ready((cdf, sel_pdf, rad_all))

    key = jax.random.PRNGKey(0)
    u3 = jax.random.uniform(key, (N, 3))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3)) * 10
    u3, pos = jax.block_until_ready((u3, pos))

    j_uni = jax.jit(lambda u, p: nee_mod.sample_light(sc, u, p, rad_all))
    j_cdf = jax.jit(
        lambda u, p: nee_mod.sample_light(sc, u, p, rad_all, cdf=cdf,
                                          sel_pdf_all=sel_pdf)
    )
    timeit("sample_light uniform", j_uni, u3, pos)
    timeit("sample_light cdf(searchsorted)", j_cdf, u3, pos)

    # isolate: searchsorted alone
    j_ss = jax.jit(lambda u: jnp.searchsorted(cdf, u[:, 0], side="right"))
    timeit("searchsorted alone", j_ss, u3)

    # one-hot selection: (R,L) compare -> idx by sum; light row via matmul
    L = cdf.shape[0]
    packed = sc.lights.packed

    def onehot_sample(u, p):
        ge = (u[:, 0:1] > cdf[None, :]).astype(jnp.float32)   # (R,L)
        idx = jnp.sum(ge, axis=1).astype(jnp.int32)
        idx = jnp.clip(idx, 0, L - 1)
        oh = jax.nn.one_hot(idx, L, dtype=jnp.float32)
        row = oh @ packed           # (R,13)
        rad = oh @ rad_all
        spdf = oh @ sel_pdf
        return row, rad, spdf, idx

    timeit("cdf one-hot matmul (row+rad+pdf)", jax.jit(onehot_sample), u3, pos)

    # plain gather costs at this N for reference
    idx = jnp.clip((u3[:, 0] * 64).astype(jnp.int32), 0, 63)
    idx = jax.block_until_ready(idx)
    timeit("gather packed[idx] (R,13)", jax.jit(lambda i: packed[i]), idx)
    timeit("gather sel_pdf[idx] (R,)", jax.jit(lambda i: sel_pdf[i]), idx)

    # argsort cost (sort_secondary feasibility)
    k32 = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 2**31 - 1,
                             dtype=jnp.int32)
    k32 = jax.block_until_ready(k32)
    timeit("argsort (N,) int32", jax.jit(jnp.argsort), k32)

    def sort_pairs(k, o, d):
        order = jnp.argsort(k)
        return order, o[order], d[order]

    timeit("argsort + permute o,d", jax.jit(sort_pairs), k32, pos, pos)


if __name__ == "__main__":
    main()
