"""Tests for ray-triangle intersection (brute-force oracle)."""
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.accel import brute


def tri(p0, p1, p2):
    return jnp.asarray(np.array([[p0, p1, p2]], np.float32))


def test_single_triangle_hit():
    t = tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = brute.intersect_closest(t, o, d, 1e-4, 1e9)
    assert int(res["tri"][0]) == 0
    np.testing.assert_allclose(float(res["t"][0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(res["u"][0]), 0.2, atol=1e-5)
    np.testing.assert_allclose(float(res["v"][0]), 0.2, atol=1e-5)


def test_miss_outside():
    t = tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.9, 0.9, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = brute.intersect_closest(t, o, d, 1e-4, 1e9)
    assert int(res["tri"][0]) == -1
    assert not np.isfinite(float(res["t"][0]))


def test_tmax_respected():
    t = tri([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = brute.intersect_closest(t, o, d, 1e-4, 0.5)
    assert int(res["tri"][0]) == -1
    assert not bool(brute.intersect_any(t, o, d, 1e-4, 0.5)[0])
    assert bool(brute.intersect_any(t, o, d, 1e-4, 2.0)[0])


def test_closest_of_two():
    t = jnp.asarray(
        np.array(
            [
                [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                [[0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5]],
            ],
            np.float32,
        )
    )
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = brute.intersect_closest(t, o, d, 1e-4, 1e9)
    assert int(res["tri"][0]) == 1  # nearer plane z=0.5
    np.testing.assert_allclose(float(res["t"][0]), 0.5, atol=1e-5)


def test_batch_rays_vs_numpy(rng):
    T = 50
    tris = rng.normal(size=(T, 3, 3)).astype(np.float32)
    o = rng.normal(size=(128, 3)).astype(np.float32) * 3
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    res = brute.intersect_closest(jnp.asarray(tris), jnp.asarray(o), jnp.asarray(d), 1e-4, 1e9)
    # numpy oracle
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from reference_pt import intersect as np_intersect

    t, tri_id, _, _ = np_intersect(
        tris.astype(np.float64), o.astype(np.float64), d.astype(np.float64),
        np.full(128, 1e-4), np.full(128, 1e9),
    )
    hits_jax = np.asarray(res["tri"])
    agree = (hits_jax == tri_id).mean()
    assert agree > 0.97  # float32 vs float64 edge cases allowed
    both = (hits_jax >= 0) & (tri_id >= 0) & (hits_jax == tri_id)
    np.testing.assert_allclose(np.asarray(res["t"])[both], t[both], rtol=1e-3)
