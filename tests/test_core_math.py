"""Unit tests for core vector math and sampling."""
import jax
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.core import sampling, vecmath as vm


def test_normalize_safe():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0], [1e-12, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(np.asarray(vm.length(n[:1])), [1.0], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(n)))


def test_onb_orthonormal(rng):
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = vm.build_onb(jnp.asarray(n))
    t, b = np.asarray(t), np.asarray(b)
    np.testing.assert_allclose((t * n).sum(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose((b * n).sum(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose((t * b).sum(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-5)
    # right-handed: t x b == n
    np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


def test_to_world_roundtrip(rng):
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    local = vm.to_local(jnp.asarray(d), jnp.asarray(n))
    back = vm.to_world(local, jnp.asarray(n))
    np.testing.assert_allclose(np.asarray(back), d, atol=1e-5)


def test_reflect():
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = vm.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [[1 / np.sqrt(2), 1 / np.sqrt(2), 0]], atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta = 1/1.5)
    d = jnp.array([[np.sqrt(0.5), -np.sqrt(0.5), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]], dtype=jnp.float32)
    wt, tir = vm.refract(d, n, jnp.array([1 / 1.5], jnp.float32))
    assert not bool(tir[0])
    sin_t = float(jnp.abs(wt[0, 0]) / vm.length(wt)[0])
    np.testing.assert_allclose(sin_t, np.sqrt(0.5) / 1.5, atol=1e-5)


def test_halton_low_discrepancy():
    idx = jnp.arange(1, 257, dtype=jnp.uint32)
    h2 = np.asarray(sampling.halton(idx, 2))
    h3 = np.asarray(sampling.halton(idx, 3))
    assert 0.45 < h2.mean() < 0.55
    assert 0.45 < h3.mean() < 0.55
    assert h2.min() >= 0 and h2.max() < 1
    # first elements of base-2 radical inverse: 1/2, 1/4, 3/4, ...
    np.testing.assert_allclose(h2[:3], [0.5, 0.25, 0.75], atol=1e-6)
    np.testing.assert_allclose(h3[:3], [1 / 3, 2 / 3, 1 / 9], atol=1e-6)


def test_cosine_hemisphere_distribution():
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (20000, 2))
    d = np.asarray(sampling.sample_cosine_hemisphere(u))
    assert np.all(d[:, 2] >= 0)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # E[cos] = 2/3 for cosine-weighted
    np.testing.assert_allclose(d[:, 2].mean(), 2 / 3, atol=0.01)


def test_sample_triangle_uniform():
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (20000, 2))
    b = np.asarray(sampling.sample_triangle(u))
    assert np.all(b >= -1e-6) and np.all(b <= 1 + 1e-6)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)
    # centroid of uniform barycentrics is (1/3,1/3,1/3)
    np.testing.assert_allclose(b.mean(0), [1 / 3] * 3, atol=0.01)


def test_power_heuristic_limits():
    a = jnp.array([1.0, 0.0, 10.0])
    b = jnp.array([1.0, 1.0, 0.0])
    w = np.asarray(sampling.power_heuristic(a, b))
    np.testing.assert_allclose(w, [0.5, 0.0, 1.0], atol=1e-6)


def test_ggx_vndf_unit_and_hemisphere():
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (1000, 2))
    wo = vm.normalize(jnp.array([[0.5, 0.1, 0.8]]).repeat(1000, 0))
    m = np.asarray(sampling.sample_ggx_vndf(wo, jnp.full((1000,), 0.3), u))
    np.testing.assert_allclose(np.linalg.norm(m, axis=-1), 1.0, atol=1e-4)
    assert np.all(m[:, 2] >= 0)
