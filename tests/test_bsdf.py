"""Disney BSDF unit tests, including the anisotropic GGX path.

≙ the reference's MDF plumbing (`CUDAKernels/ggxmdf.cuh` GGXMDF::D/G with
alpha_x/alpha_y, wired through `disney.cuh`): `anisotropic` stretches the
specular lobe along the surface's U tangent; anisotropic == 0 must reduce
exactly to the isotropic formulas (shared code path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.bsdf import common, disney
from lumenrenderer_tpu.core import vecmath as vm
from lumenrenderer_tpu.integrator.surface import SurfaceData
from lumenrenderer_tpu.scene.materials import MaterialSpec, build_material_table


def _surface(n_rays, spec: MaterialSpec, normal=(0.0, 0.0, 1.0),
             tangent=(1.0, 0.0, 0.0)):
    """A flat SurfaceData batch with one material everywhere."""
    table = build_material_table([spec])
    rows = jnp.broadcast_to(table.packed()[0], (n_rays, table.packed().shape[1]))
    one = jnp.ones((n_rays,), jnp.float32)
    vec = lambda v: jnp.broadcast_to(jnp.asarray(v, jnp.float32), (n_rays, 3))
    return SurfaceData(
        position=jnp.zeros((n_rays, 3)),
        normal=vec(normal),
        geo_normal=vec(normal),
        uv=jnp.zeros((n_rays, 2)),
        base_color=vec(spec.base_color),
        emissive=jnp.zeros((n_rays, 3)),
        metallic=one * spec.metallic,
        roughness=one * spec.roughness,
        alpha=one,
        mat_idx=jnp.zeros((n_rays,), jnp.int32),
        mat_rows=rows,
        light_row=jnp.full((n_rays,), -1, jnp.int32),
        tri_idx=jnp.zeros((n_rays,), jnp.int32),
        tangent=vec(tangent),
        t=one,
        valid=one > 0.0,
        is_emissive=one < 0.0,
        front_face=one > 0.0,
    )


def test_aniso_mdf_reduces_to_iso():
    """ax == ay must reproduce the isotropic D/G/pdf bit-for-bit-ish."""
    rng = np.random.default_rng(0)
    h = rng.standard_normal((256, 3)).astype(np.float32)
    h = jnp.asarray(h / np.linalg.norm(h, axis=-1, keepdims=True))
    h = h.at[:, 2].set(jnp.abs(h[:, 2]))
    wo = jnp.asarray([0.3, -0.2, 0.93]) / jnp.linalg.norm(
        jnp.asarray([0.3, -0.2, 0.93]))
    wo = jnp.broadcast_to(wo, (256, 3))
    wi = h  # arbitrary upper-hemisphere dirs
    alpha = jnp.full((256,), 0.13)
    d_iso = common.ggx_d(h[:, 2], alpha)
    d_a = common.ggx_d_aniso(h, alpha, alpha)
    np.testing.assert_allclose(d_a, d_iso, rtol=2e-5)
    g_iso = common.smith_g2(wo[:, 2], wi[:, 2], alpha)
    g_a = common.smith_g2_aniso(wo, wi, alpha, alpha)
    np.testing.assert_allclose(g_a, g_iso, rtol=2e-5)


def test_aniso_stretches_highlight_along_tangent():
    """With ax > ay (anisotropic > 0) a half-vector tilted along the tangent
    keeps more energy than the same tilt along the bitangent."""
    spec = MaterialSpec(base_color=(1.0, 1.0, 1.0), metallic=1.0,
                        roughness=0.3, anisotropic=0.9)
    sd = _surface(2, spec)
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3))
    # wi tilted 30 deg along +x (tangent) vs +y (bitangent)
    s, c = np.sin(np.pi / 6), np.cos(np.pi / 6)
    wi = jnp.asarray([[2 * s * c, 0.0, 1 - 2 * s * s],
                      [0.0, 2 * s * c, 1 - 2 * s * s]], jnp.float32)
    # (half-vector of (wo, wi) is the 15-deg tilt in each plane)
    f, _ = disney.evaluate(None, sd, wo, wi)
    f = np.asarray(f)
    assert f[0, 0] > 2.0 * f[1, 0], (f[0, 0], f[1, 0])


def test_aniso_zero_matches_iso_frame_invariance():
    """anisotropic == 0 must give identical f/pdf for any tangent direction
    (isotropic BSDFs are rotation-invariant about the normal)."""
    spec = MaterialSpec(base_color=(0.7, 0.5, 0.3), metallic=0.6,
                        roughness=0.25)
    rng = np.random.default_rng(1)
    wo = jnp.asarray([0.4, 0.1, 0.91]); wo = wo / jnp.linalg.norm(wo)
    wi = jnp.asarray([-0.3, 0.5, 0.81]); wi = wi / jnp.linalg.norm(wi)
    wo = jnp.broadcast_to(wo, (4, 3)); wi = jnp.broadcast_to(wi, (4, 3))
    f1, p1 = disney.evaluate(None, _surface(4, spec, tangent=(1, 0, 0)), wo, wi)
    f2, p2 = disney.evaluate(
        None, _surface(4, spec, tangent=(0.6, 0.8, 0.0)), wo, wi)
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(p1, p2, rtol=1e-4, atol=1e-7)


def test_aniso_sample_eval_consistent():
    """MC: E[f cos / pdf] over BSDF samples equals the hemispherical albedo
    estimated with uniform-direction evaluation (same integral, two
    estimators) for a smooth anisotropic metal."""
    n = 200_000
    spec = MaterialSpec(base_color=(1.0, 1.0, 1.0), metallic=1.0,
                        roughness=0.45, anisotropic=0.8)
    sd = _surface(n, spec)
    wo_dir = jnp.asarray([0.25, -0.35, 0.9])
    wo = jnp.broadcast_to(wo_dir / jnp.linalg.norm(wo_dir), (n, 3))
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (n, 4))
    wi, f, pdf, _ = disney.sample(None, sd, wo, u)
    cos_i = jnp.maximum(wi[:, 2], 0.0)
    est_sample = jnp.mean(
        jnp.where(pdf > 1e-7, vm.luminance(f) * cos_i / jnp.maximum(pdf, 1e-7),
                  0.0))
    # uniform-hemisphere estimator of the same integral
    k2 = jax.random.PRNGKey(11)
    v = jax.random.normal(k2, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v.at[:, 2].set(jnp.abs(v[:, 2]))
    fu, _ = disney.evaluate(None, sd, wo, v)
    est_uniform = jnp.mean(vm.luminance(fu) * v[:, 2]) * 2.0 * jnp.pi
    assert np.isfinite(float(est_sample)) and np.isfinite(float(est_uniform))
    np.testing.assert_allclose(float(est_sample), float(est_uniform),
                               rtol=0.08)


@pytest.mark.parametrize("aniso", [0.0, 0.9])
def test_aniso_energy_conservation(aniso):
    """Directional albedo of a white anisotropic metal never exceeds 1."""
    n = 100_000
    spec = MaterialSpec(base_color=(1.0, 1.0, 1.0), metallic=1.0,
                        roughness=0.2, anisotropic=aniso)
    sd = _surface(n, spec)
    wo_dir = jnp.asarray([0.5, 0.2, 0.84])
    wo = jnp.broadcast_to(wo_dir / jnp.linalg.norm(wo_dir), (n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(3), (n, 4))
    wi, f, pdf, _ = disney.sample(None, sd, wo, u)
    cos_i = jnp.maximum(wi[:, 2], 0.0)
    albedo = float(jnp.mean(
        jnp.where(pdf > 1e-7, vm.luminance(f) * cos_i / jnp.maximum(pdf, 1e-7),
                  0.0)))
    assert albedo <= 1.05, albedo
    assert albedo > 0.3, albedo
