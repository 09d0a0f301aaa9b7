"""M6: volumetrics (BASELINE config 4) — analytic transmittance, in-scatter,
and density gradients vs finite differences."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.integrator.wavefront import (
    RenderConfig,
    merge_channels,
    render_wavefront,
)
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.scene.materials import MaterialSpec
from lumenrenderer_tpu.scene.scene import SceneBuilder
from lumenrenderer_tpu.volume import grid as vgrid


def test_trilinear_sampling_constant_grid():
    vs = vgrid.make_volume_set(
        [np.full((8, 8, 8), 2.5, np.float32)], [(0, 0, 0)], [(1, 1, 1)]
    )
    pos = jnp.asarray(np.random.default_rng(0).uniform(0.1, 0.9, (100, 3)).astype(np.float32))
    d = vgrid.sample_density(vs, jnp.zeros(100, jnp.int32), pos)
    np.testing.assert_allclose(np.asarray(d), 2.5, atol=1e-5)
    # outside -> 0
    d_out = vgrid.sample_density(vs, jnp.zeros(1, jnp.int32), jnp.array([[2.0, 0.5, 0.5]]))
    assert float(d_out[0]) == 0.0


def _fog_scene(sigma_t=1.5, albedo=0.0, env=2.0):
    """Env-lit empty world with one unit fog cube in front of the camera."""
    b = SceneBuilder(env_radiance=(env, env, env))
    # tiny faraway triangle so the geometry pipeline has >0 triangles
    m = b.add_material(MaterialSpec(base_color=(0.5, 0.5, 0.5)))
    b.add_instance(
        presets.InstanceHost(
            mesh=presets.make_quad_mesh(
                [(-1000, -1000, -500), (-999, -1000, -500), (-999, -999, -500), (-1000, -999, -500)], m
            )
        )
    )
    b.add_volume(
        np.ones((8, 8, 8), np.float32), (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
        sigma_t=sigma_t, albedo=albedo,
    )
    sc = b.build()
    from lumenrenderer_tpu.core.camera import Camera

    cam = Camera.look_at(eye=(0, 0, 3), target=(0, 0, 0), fov_y_deg=10.0)
    return sc, cam


def test_beer_lambert_analytic():
    """Homogeneous cube, pure absorption: center pixel = env * exp(-sigma*L),
    exact for any step count (constant density)."""
    sigma, env = 1.5, 2.0
    sc, cam = _fog_scene(sigma_t=sigma, albedo=0.0, env=env)
    from lumenrenderer_tpu.accel import stream

    cs = stream.build_clusters(sc.tri_pos, cluster_size=2)
    isect, occl = stream.stream_intersectors(cs, max_pairs_per_ray=4)
    cfg = RenderConfig(width=9, height=9, max_depth=2, bsdf="lambert",
                       light_strategy="bsdf", jitter="center", volume_steps=4)
    out = jax.jit(
        lambda: render_wavefront(sc, isect, occl, cam, jax.random.PRNGKey(0),
                                 jnp.uint32(0), cfg)
    )()
    img = np.asarray(merge_channels(out)).reshape(9, 9, 3)
    center = img[4, 4, 0]
    expected = env * np.exp(-sigma * 1.0)  # unit cube thickness
    np.testing.assert_allclose(center, expected, rtol=2e-3)
    # corner pixels (10 deg fov still inside cube) also attenuated
    assert img.max() < env


def test_in_scatter_positive_with_light():
    scene, camf = presets.cornell_box(with_blocks=False)
    scene.add_volume(
        vgrid.sphere_density(16), (0.3, 0.2, 0.3), (0.7, 0.6, 0.7),
        sigma_t=4.0, albedo=0.9,
    )
    sc, cam = scene.build(), camf(1.0)
    r = Renderer(
        sc,
        RenderConfig(width=24, height=24, max_depth=2, bsdf="lambert",
                     light_strategy="nee", volume_steps=5),
        accel="stream", cluster_size=8, donate=False,
    )
    st = r.init_state(0)
    st, _ = r.render_frame(st, cam)
    img = np.asarray(st.accum)
    assert np.isfinite(img).all()
    # volumetric channel present and positive somewhere
    from lumenrenderer_tpu.accel import stream as s2

    cs = s2.build_clusters(sc.tri_pos, cluster_size=8)
    isect, occl = s2.stream_intersectors(cs)
    cfg = r.config
    out = jax.jit(
        lambda: render_wavefront(sc, isect, occl, cam, jax.random.PRNGKey(1),
                                 jnp.uint32(0), cfg)
    )()
    vol = np.asarray(out["volumetric"])
    assert vol.max() > 0


def test_density_gradient_matches_fd():
    """d mean_image / d density_scale vs central differences (fixed key)."""
    sigma, env = 1.0, 1.0
    sc, cam = _fog_scene(sigma_t=sigma, albedo=0.0, env=env)
    from lumenrenderer_tpu.accel import stream

    cs = stream.build_clusters(sc.tri_pos, cluster_size=2)
    isect, occl = stream.stream_intersectors(cs, max_pairs_per_ray=4)
    cfg = RenderConfig(width=8, height=8, max_depth=2, bsdf="lambert",
                       light_strategy="bsdf", jitter="center", volume_steps=4)
    key = jax.random.PRNGKey(5)

    def loss(scale):
        vols = sc.volumes.replace(density=sc.volumes.density * scale)
        sc2 = sc.replace(volumes=vols)
        out = render_wavefront(sc2, isect, occl, cam, key, jnp.uint32(0), cfg)
        return merge_channels(out).mean()

    g = float(jax.grad(loss)(jnp.float32(1.0)))
    f = jax.jit(loss)
    fd = float((f(jnp.float32(1.05)) - f(jnp.float32(0.95))) / 0.1)
    assert g < 0  # denser fog -> darker env
    np.testing.assert_allclose(g, fd, rtol=2e-2)


def test_volume_absent_is_noop():
    scene, camf = presets.cornell_box()
    sc, cam = scene.build(), camf(1.0)
    assert sc.volumes is None
    r = Renderer(sc, RenderConfig(width=8, height=8, max_depth=2, bsdf="lambert"),
                 accel="stream", cluster_size=8, donate=False)
    st = r.init_state(0)
    st, _ = r.render_frame(st, cam)
    assert np.isfinite(np.asarray(st.accum)).all()


# ---------------------------------------------------------------------------
# round 4: ratio-tracking transmittance (BASELINE config 4)
# ---------------------------------------------------------------------------

def _hetero_volume():
    import numpy as np

    from lumenrenderer_tpu.volume.grid import make_volume_set

    # strongly heterogeneous: a dense blob in one corner, near-empty rest
    n = 16
    g = np.zeros((n, n, n), np.float32)
    g[:4, :4, :4] = 8.0
    g[8:, 8:, 8:] = 0.25
    return make_volume_set([g], [(0.0, 0.0, 0.0)], [(2.0, 2.0, 2.0)],
                           sigma_t=[1.0], albedo=[0.5])


def test_ratio_tracking_unbiased_vs_dense_integral():
    """Mean of the ratio-tracking estimator must match a fine numeric
    integral; the 5-step Riemann march must be measurably biased on the same
    heterogeneous grid."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lumenrenderer_tpu.volume import march
    from lumenrenderer_tpu.volume.grid import sample_density

    vols = _hetero_volume()
    r = 64
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-0.5, 0.0, (r, 3)), jnp.float32)
    d = jnp.asarray([1.0, 0.8, 0.6]) / np.linalg.norm([1.0, 0.8, 0.6])
    d = jnp.broadcast_to(d, (r, 3)).astype(jnp.float32)
    tn = jnp.zeros((r,))
    tx = jnp.full((r,), 10.0)

    # ground truth: 4096-step Riemann (converged)
    truth = march.transmittance_only(vols, o, d, tn, tx, steps=4096)

    # ratio tracking: average over keys
    reps = 200
    acc = jnp.zeros((r,))
    f = jax.jit(lambda k: march.transmittance_only(
        vols, o, d, tn, tx, key=k, estimator="ratio"))
    for i in range(reps):
        acc = acc + f(jax.random.PRNGKey(i))
    ratio_mean = acc / reps

    err_ratio = float(jnp.max(jnp.abs(ratio_mean - truth)))
    assert err_ratio < 0.06, err_ratio  # max over 64 rays of ~1/sqrt(200) MC noise

    # the reference's 5-step march on the same rays: visibly biased
    acc5 = jnp.zeros((r,))
    f5 = jax.jit(lambda k: march.transmittance_only(
        vols, o, d, tn, tx, steps=5, key=k))
    for i in range(reps):
        acc5 = acc5 + f5(jax.random.PRNGKey(i))
    err_riemann = float(jnp.max(jnp.abs(acc5 / reps - truth)))
    assert err_riemann > 2.0 * err_ratio, (err_riemann, err_ratio)


def test_ratio_tracking_matches_riemann_on_smooth_grid():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lumenrenderer_tpu.volume import march
    from lumenrenderer_tpu.volume.grid import make_volume_set

    g = np.full((8, 8, 8), 0.7, np.float32)  # homogeneous
    vols = make_volume_set([g], [(0., 0., 0.)], [(1., 1., 1.)],
                           sigma_t=[1.2], albedo=[0.5])
    r = 32
    o = jnp.broadcast_to(jnp.asarray([-0.5, 0.5, 0.5]), (r, 3))
    d = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (r, 3))
    tn = jnp.zeros((r,))
    tx = jnp.full((r,), 5.0)
    truth = float(jnp.exp(jnp.asarray(-0.7 * 1.2 * 1.0)))
    acc = jnp.zeros((r,))
    reps = 300
    f = jax.jit(lambda k: march.transmittance_only(
        vols, o, d, tn, tx, key=k, estimator="ratio"))
    for i in range(reps):
        acc = acc + f(jax.random.PRNGKey(1000 + i))
    got = float(jnp.mean(acc / reps))
    assert abs(got - truth) < 0.02, (got, truth)


def test_ratio_estimator_selectable_through_config():
    """The frame runs end-to-end with volume_transmittance='ratio'."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lumenrenderer_tpu.integrator.wavefront import (
        RenderConfig, merge_channels, render_wavefront)
    from lumenrenderer_tpu.accel import sah, traverse
    from lumenrenderer_tpu.scene import presets
    from lumenrenderer_tpu.scene.scene import SceneBuilder
    from lumenrenderer_tpu.scene.materials import MaterialSpec

    b = SceneBuilder(env_radiance=(0.1, 0.1, 0.1))
    white = b.add_material(MaterialSpec(base_color=(0.7, 0.7, 0.7)))
    lightm = b.add_material(MaterialSpec(base_color=(0, 0, 0),
                                         emissive=(20., 20., 20.)))
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(-3, 0, -3), (3, 0, -3), (3, 0, 3), (-3, 0, 3)], white)))
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(-1, 4, -1), (-1, 4, 1), (1, 4, 1), (1, 4, -1)], lightm)))
    import numpy as _np
    g = _np.zeros((8, 8, 8), _np.float32)
    g[:, :4] = 2.0
    b.add_volume(g, (-1, 0.5, -1), (1, 2.5, 1), sigma_t=1.0, albedo=0.6)
    sc = b.build()
    from lumenrenderer_tpu.core.camera import Camera
    cam = Camera.look_at(eye=(0, 2, 6), target=(0, 1, 0), fov_y_deg=45.0)
    bvh = sah.build_sah(sc.tri_pos, leaf_size=8)
    isect, occl = traverse.bvh_intersectors(bvh)
    imgs = {}
    for est in ("riemann", "ratio"):
        cfg = RenderConfig(width=16, height=16, max_depth=2, bsdf="lambert",
                           light_strategy="nee", rr_start_depth=99,
                           volume_transmittance=est, sort_secondary=False)
        acc = 0
        for i in range(24):
            out = render_wavefront(sc, isect, occl, cam,
                                   jax.random.PRNGKey(i), jnp.uint32(i), cfg)
            acc = acc + np.asarray(merge_channels(out))
        imgs[est] = acc / 24
        assert np.isfinite(imgs[est]).all()
    # both estimate the same transmittance field: images agree to MC noise
    diff = np.abs(imgs["ratio"] - imgs["riemann"]).mean()
    assert diff < 0.12 * max(imgs["riemann"].mean(), 1e-6), diff
