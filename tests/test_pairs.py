"""Pair-admission intersector (accel/pairs.py) vs the brute oracle.

Small scenes on CPU (Pallas interpret mode). The pair path refines cluster
admission per RAY: correctness must match brute for closest (t/tri) and any
(occlusion) queries, including dead lanes and per-ray t windows.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lumenrenderer_tpu.accel import brute, pairs, stream


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(7)
    t = 600
    tri = rng.uniform(-1, 1, (t, 3, 3)).astype(np.float32)
    tri[:, 1:] = tri[:, :1] + 0.3 * rng.uniform(-1, 1, (t, 2, 3)).astype(
        np.float32)
    r = 900
    o = rng.uniform(-2, 2, (r, 3)).astype(np.float32)
    d = rng.uniform(-1, 1, (r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tx = np.where(rng.uniform(size=r) < 0.25, -1.0, 1e8).astype(np.float32)
    return tri, o, d, tx


def test_pairs_closest_matches_brute(soup):
    tri, o, d, tx = soup
    cs = stream.build_clusters(tri, cluster_size=32)
    ref = brute.intersect_closest(tri, o, d, 1e-3, tx)
    got = pairs.intersect_closest(cs, o, d, 1e-3, tx, decode=True,
                                  max_pairs_per_ray=16, precision="highest")
    assert not bool(got["overflow"])
    hr = np.isfinite(np.asarray(ref["t"]))
    hg = np.isfinite(np.asarray(got["t"]))
    np.testing.assert_array_equal(hr, hg)
    m = hr
    np.testing.assert_allclose(np.asarray(got["t"])[m],
                               np.asarray(ref["t"])[m], rtol=1e-4, atol=1e-5)
    # winners agree wherever t is not a co-near tie
    tie = np.zeros_like(m)
    np.testing.assert_array_equal(
        np.asarray(got["tri"])[m & ~tie], np.asarray(ref["tri"])[m & ~tie])


def test_pairs_fast_path_quantized_t(soup):
    tri, o, d, tx = soup
    cs = stream.build_clusters(tri, cluster_size=32)
    ref = brute.intersect_closest(tri, o, d, 1e-3, tx)
    got = pairs.intersect_closest(cs, o, d, 1e-3, tx, decode=False,
                                  max_pairs_per_ray=16, precision="highest")
    hr = np.isfinite(np.asarray(ref["t"]))
    np.testing.assert_array_equal(hr, np.asarray(got["occluded"]))
    m = hr
    rt = np.asarray(ref["t"])[m]
    qt = np.asarray(got["t"])[m]
    # key-quantized t: truncated to ~2^-(23-k_bits) relative
    assert np.max(np.abs(qt - rt) / np.maximum(rt, 1e-3)) < 2e-4
    np.testing.assert_array_equal(np.asarray(got["tri"])[m],
                                  np.asarray(ref["tri"])[m])


def test_pairs_any_matches_brute(soup):
    tri, o, d, tx = soup
    cs = stream.build_clusters(tri, cluster_size=32)
    tx2 = np.where(tx > 0, 1.2, -1.0).astype(np.float32)
    ref = np.asarray(brute.intersect_any(tri, o, d, 1e-3, tx2))
    got = np.asarray(pairs.intersect_any(cs, o, d, 1e-3, tx2,
                                         max_pairs_per_ray=16,
                                         precision="highest"))
    np.testing.assert_array_equal(ref, got)


def test_pairs_overflow_flag(soup):
    tri, o, d, tx = soup
    cs = stream.build_clusters(tri, cluster_size=32)
    # max_pairs_per_ray=1 cannot hold the admission set -> must flag
    got = pairs.intersect_closest(cs, o, d, 1e-3, np.full_like(tx, 1e8),
                                  decode=False, max_pairs_per_ray=1)
    assert bool(got["overflow"])


def test_pairs_detached_gradient_guard(soup):
    import jax

    tri, o, d, tx = soup
    cs = stream.build_clusters(tri, cluster_size=32)

    def f(shift):
        res = pairs.intersect_closest(
            cs, o + shift, d, 1e-3, jnp.asarray(np.full_like(tx, 1e8)),
            decode=False, max_pairs_per_ray=16)
        return jnp.sum(jnp.where(jnp.isfinite(res["t"]), res["t"], 0.0))

    g = jax.grad(f)(jnp.zeros((3,), jnp.float32))
    # traversal is non-differentiable by design: symbolic-zero tangents
    assert np.allclose(np.asarray(g), 0.0)
