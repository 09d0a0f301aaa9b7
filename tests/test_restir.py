"""M5: ReSTIR DI correctness (BASELINE config 3 foundations).

Unbiasedness: single-frame RIS(+visibility) must converge to the same
direct-lighting image as plain NEE. The reference asserts reservoir
invariants at runtime (`ReSTIRData.h:124-127`); here they are unit tests.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.restir import di
from lumenrenderer_tpu.scene import presets


@functools.lru_cache(maxsize=None)
def _scene():
    scene, camf = presets.interior_scene(n_boxes=15, n_lights=12, seed=3)
    return scene.build(), camf(1.0)


def test_cdf_monotone_and_normalized():
    sc, _ = _scene()
    cdf, pdf = di.build_light_cdf(sc)
    c = np.asarray(cdf)
    p = np.asarray(pdf)
    assert np.all(np.diff(c) >= -1e-7)  # monotone (≙ DebugPrintCdf check)
    np.testing.assert_allclose(c[-1], 1.0, atol=1e-5)
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)
    n_valid = int(sc.lights.count)
    assert np.all(p[n_valid:] == 0)


def test_cdf_sampling_distribution():
    sc, _ = _scene()
    cdf, pdf = di.build_light_cdf(sc)
    u = jax.random.uniform(jax.random.PRNGKey(0), (200000,))
    idx = np.asarray(di.sample_cdf(cdf, u))
    p = np.asarray(pdf)
    counts = np.bincount(idx, minlength=p.shape[0]) / idx.shape[0]
    np.testing.assert_allclose(counts, p, atol=5e-3)


def test_light_bags_shapes_and_validity():
    sc, _ = _scene()
    cfg = di.RestirConfig(num_bags=8, bag_size=64)
    cdf, _ = di.build_light_cdf(sc)
    bags = di.fill_light_bags(cdf, cfg, jax.random.PRNGKey(1))
    assert bags.shape == (8, 64)
    assert int(bags.max()) < int(sc.lights.count)
    assert int(bags.min()) >= 0


def _render(use_restir, spp, restir_cfg=None, seed=0):
    sc, cam = _scene()
    cfg = RenderConfig(
        width=40, height=40, max_depth=1, bsdf="lambert",
        light_strategy="nee", use_restir=use_restir, rr_start_depth=99,
    )
    r = Renderer(sc, cfg, accel="stream", cluster_size=32,
                 restir_config=restir_cfg, donate=False)
    st = r.init_state(seed)
    for _ in range(spp):
        st, _ = r.render_frame(st, cam)
    return np.asarray(st.accum).reshape(40, 40, 3)


def test_restir_ris_only_unbiased():
    """RIS(+visibility) without reuse must match NEE — exact unbiasedness."""
    rcfg = di.RestirConfig(
        candidates=8, num_bags=8, bag_size=128, spatial_iterations=0,
    )
    spp = 60
    img_nee = _render(False, spp)
    img_res = _render(True, spp, rcfg)
    m_n, m_r = img_nee.mean(), img_res.mean()
    assert abs(m_r - m_n) / m_n < 0.06, (m_r, m_n)
    t = lambda a: a.reshape(8, 5, 8, 5, 3).mean((1, 3))
    rel = np.abs(t(img_res) - t(img_nee)) / (t(img_nee) + 0.05)
    assert np.quantile(rel, 0.9) < 0.25


def test_restir_spatial_open_scene_near_exact():
    """With little occlusion variance, the biased spatial combine must be
    near-exact (<8%); residual = similarity-gate edge effects."""
    scene, camf = presets.interior_scene(n_boxes=0, n_lights=12, seed=3)
    sc, cam = scene.build(), camf(1.0)
    rcfg = di.RestirConfig(candidates=8, num_bags=8, bag_size=128,
                           spatial_iterations=2, spatial_samples=3, spatial_radius=8)

    def render(use_restir, spp, seed=0):
        cfg = RenderConfig(width=40, height=40, max_depth=1, bsdf="lambert",
                           light_strategy="nee", use_restir=use_restir, rr_start_depth=99)
        r = Renderer(sc, cfg, accel="stream", cluster_size=32,
                     restir_config=rcfg, donate=False)
        st = r.init_state(seed)
        for _ in range(spp):
            st, _ = r.render_frame(st, cam)
        return np.asarray(st.accum).reshape(40, 40, 3)

    a = render(False, 40)
    b = render(True, 40)
    assert abs(b.mean() - a.mean()) / a.mean() < 0.08, (b.mean(), a.mean())


def test_restir_spatial_cluttered_bounded_darkening():
    """Biased mode darkens where neighbour visibility disagrees (known
    property, shared with the reference's biased default) — must stay
    bounded and never brighten."""
    rcfg = di.RestirConfig(candidates=8, num_bags=8, bag_size=128,
                           spatial_iterations=2, spatial_samples=3, spatial_radius=8)
    img_nee = _render(False, 40)
    img_res = _render(True, 40, rcfg)
    ratio = img_res.mean() / img_nee.mean()
    assert 0.6 < ratio < 1.05, ratio


def test_restir_reduces_variance_vs_single_candidate_nee():
    """32-candidate RIS should be much less noisy than 1-sample NEE at the
    same frame count — the whole point of ReSTIR."""
    rcfg = di.RestirConfig(
        candidates=16, num_bags=8, bag_size=128, spatial_iterations=1,
        spatial_samples=3, spatial_radius=8,
    )
    ref = _render(False, 120, seed=7)
    nee1 = _render(False, 4, seed=1)
    res1 = _render(True, 4, rcfg, seed=1)
    err_nee = np.abs(nee1 - ref).mean()
    err_res = np.abs(res1 - ref).mean()
    assert err_res < err_nee * 0.85, (err_res, err_nee)


def test_temporal_state_threads_through_frames():
    sc, cam = _scene()
    cfg = RenderConfig(
        width=24, height=24, max_depth=1, bsdf="lambert",
        light_strategy="nee", use_restir=True, rr_start_depth=99,
    )
    r = Renderer(sc, cfg, accel="stream", cluster_size=32, donate=False,
                 restir_config=di.RestirConfig(candidates=4, num_bags=4, bag_size=32,
                                               spatial_iterations=0))
    st = r.init_state(0)
    assert not bool(st.restir.valid)
    st, _ = r.render_frame(st, cam)
    assert bool(st.restir.valid)
    m1 = np.asarray(st.restir.reservoir.m).max()
    st, _ = r.render_frame(st, cam)
    m2 = np.asarray(st.restir.reservoir.m).max()
    assert m2 > m1  # temporal accumulation grows M
    assert np.isfinite(np.asarray(st.accum)).all()


def test_reservoir_invariants():
    """w_out and p_hat stay finite and non-negative (≙ device asserts
    `ReSTIRData.h:124-127`)."""
    sc, cam = _scene()
    cfg = RenderConfig(width=24, height=24, max_depth=1, bsdf="lambert",
                       light_strategy="nee", use_restir=True, rr_start_depth=99)
    r = Renderer(sc, cfg, accel="stream", cluster_size=32, donate=False)
    st = r.init_state(0)
    for _ in range(3):
        st, _ = r.render_frame(st, cam)
    res = st.restir.reservoir
    for f in (res.w_sum, res.m, res.w_out, res.p_hat):
        a = np.asarray(f)
        assert np.isfinite(a).all()
        assert (a >= 0).all()


def test_restir_unbiased_combine_cluttered():
    """cfg.biased=False (≙ CombineUnbiased, ReSTIRKernels.cu:1123-1199):
    re-evaluating the winner at each contributing neighbour's surface must
    remove the cluttered-scene darkening the biased default shows."""
    base = dict(candidates=8, num_bags=8, bag_size=128,
                spatial_iterations=2, spatial_samples=3, spatial_radius=8)
    img_nee = _render(False, 50)
    img_b = _render(True, 50, di.RestirConfig(**base, biased=True))
    img_u = _render(True, 50, di.RestirConfig(**base, biased=False))
    r_b = img_b.mean() / img_nee.mean()
    r_u = img_u.mean() / img_nee.mean()
    # unbiased must sit closer to NEE than biased, and within 8%
    assert abs(r_u - 1.0) < 0.08, (r_u, r_b)
    assert abs(r_u - 1.0) <= abs(r_b - 1.0) + 0.02, (r_u, r_b)


def test_restir_volumetric_shadow_attenuation():
    """A fog slab between the lights and the floor must darken the ReSTIR
    DIRECT channel (volumes wired through visibility_pass — VERDICT r2 #2)."""
    import numpy as np
    from lumenrenderer_tpu.scene.materials import MaterialSpec
    from lumenrenderer_tpu.scene.scene import SceneBuilder
    from lumenrenderer_tpu.core.camera import Camera

    def build(with_fog):
        b = SceneBuilder()
        floor = b.add_material(MaterialSpec(base_color=(0.8, 0.8, 0.8),
                                            roughness=1.0))
        b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
            [(-4, 0, 4), (4, 0, 4), (4, 0, -4), (-4, 0, -4)], floor)))
        lm = b.add_material(MaterialSpec(base_color=(0, 0, 0),
                                         emissive=(40.0,) * 3))
        b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
            [(-1, 4.0, -1), (1, 4.0, -1), (1, 4.0, 1), (-1, 4.0, 1)], lm)))
        if with_fog:
            b.add_volume(np.ones((4, 4, 4), np.float32),
                         (-3, 1.8, -3), (3, 2.2, 3), sigma_t=2.0, albedo=0.0)
        return b.build()

    cam = Camera.look_at(eye=(0, 2.5, 5.0), target=(0, 0, 0), fov_y_deg=35.0)
    rcfg = di.RestirConfig(candidates=8, num_bags=4, bag_size=32,
                           spatial_iterations=0)

    def render(sc):
        cfg = RenderConfig(width=16, height=16, max_depth=1, bsdf="lambert",
                           light_strategy="nee", use_restir=True,
                           rr_start_depth=99, volume_depths=0)
        r = Renderer(sc, cfg, accel="stream", cluster_size=32,
                     restir_config=rcfg, donate=False)
        st = r.init_state(0)
        for _ in range(10):
            st, _ = r.render_frame(st, cam)
        return np.asarray(st.accum)

    img_fog = render(build(True))
    img_clear = render(build(False))
    lit = img_clear.mean(axis=1) > 0.05
    ratio = img_fog[lit].mean() / img_clear[lit].mean()
    expect = float(np.exp(-2.0 * 0.4))
    assert ratio < 0.8, ratio
    assert abs(ratio - expect) < 0.2, (ratio, expect)
