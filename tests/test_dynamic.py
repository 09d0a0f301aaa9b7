"""Dynamic scene path (round 4, VERDICT #7): moving an instance across frames
rebakes geometry/lights/clusters on device with NO recompile, and the image
tracks the motion (≙ PTScene dirty-IAS rebuild, PTScene.cpp:77-160)."""
import jax
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.core.camera import Camera
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.scene.dynamic import DynamicScene
from lumenrenderer_tpu.scene.materials import MaterialSpec
from lumenrenderer_tpu.scene.scene import SceneBuilder


def _scene():
    b = SceneBuilder(env_radiance=(0.3, 0.3, 0.3))
    red = b.add_material(MaterialSpec(base_color=(0.9, 0.1, 0.1),
                                      roughness=1.0))
    lightm = b.add_material(MaterialSpec(base_color=(0, 0, 0),
                                         emissive=(30.0, 30.0, 30.0)))
    # a small box near the origin and a light panel above
    b.add_instance(presets.InstanceHost(
        mesh=presets.box_mesh((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5), red)))
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(-1, 4, -1), (1, 4, -1), (1, 4, 1), (-1, 4, 1)], lightm)))
    return b


def test_instance_moves_without_recompile():
    dyn = DynamicScene(_scene())
    sc = dyn.build()
    cam = Camera.look_at(eye=(0, 0, 6), target=(0, 0, 0), fov_y_deg=40.0)
    cfg = RenderConfig(width=32, height=32, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", sort_secondary=False)
    r = Renderer(sc, cfg, accel="tiled", use_pallas=False, dynamic=dyn,
                 donate=False)

    st = r.init_state(0)
    st, aux0 = r.render_frame(st, cam)
    d0 = np.asarray(aux0["depth"]).reshape(32, 32)

    # move the box to the right by 1.5 units
    dyn.transform(0).translation = (1.5, 0.0, 0.0)
    assert dyn.dirty
    st, aux1 = r.render_frame(st, cam)
    d1 = np.asarray(aux1["depth"]).reshape(32, 32)

    # NO retrace: the jitted step compiled exactly once
    assert r._step._cache_size() == 1, r._step._cache_size()

    # the silhouette moved: center column hit before, not after; right
    # side hit after, not before
    assert d0[16, 16] > 0.0          # box at center initially
    assert d1[16, 16] == 0.0         # moved away
    right = d1[16, 24:].max()
    assert right > 0.0               # appears to the right
    # lights moved with nothing (light instance untouched): light panel
    # keeps illuminating; image stays finite
    assert np.isfinite(d1).all()


def _scene_frontlit():
    b = SceneBuilder(env_radiance=(0.05, 0.05, 0.05))
    red = b.add_material(MaterialSpec(base_color=(0.9, 0.1, 0.1),
                                      roughness=1.0))
    lightm = b.add_material(MaterialSpec(base_color=(0, 0, 0),
                                         emissive=(30.0, 30.0, 30.0)))
    b.add_instance(presets.InstanceHost(
        mesh=presets.box_mesh((-0.5, -0.5, -0.5), (0.5, 0.5, 0.5), red)))
    # panel in FRONT of the box (+z, off-axis) so the camera-facing face is
    # directly lit
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(1.5, -1, 3), (1.5, 1, 3), (3.5, 1, 3), (3.5, -1, 3)], lightm)))
    return b


def test_light_instance_motion_refits_light_table():
    dyn = DynamicScene(_scene_frontlit())
    sc = dyn.build()
    cam = Camera.look_at(eye=(0, 0, 6), target=(0, 0, 0), fov_y_deg=40.0)
    cfg = RenderConfig(width=24, height=24, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", sort_secondary=False)
    r = Renderer(sc, cfg, accel="tiled", use_pallas=False, dynamic=dyn,
                 donate=False)
    st = r.init_state(0)
    st, aux = r.render_frame(st, cam)
    hit = np.asarray(aux["depth"]) > 0.0
    img_near = np.asarray(st.accum)[hit].mean()

    # move the LIGHT far away: NEE geometry/pdf must follow -> the box's
    # direct lighting collapses (only env ambient remains on it)
    dyn.transform(1).translation = (0.0, 40.0, 0.0)
    st2 = r.init_state(1)
    st2, aux2 = r.render_frame(st2, cam)
    hit2 = np.asarray(aux2["depth"]) > 0.0
    img_far = np.asarray(st2.accum)[hit2].mean()
    assert r._step._cache_size() == 1
    assert img_far < img_near * 0.6, (img_near, img_far)


def test_rebake_matches_fresh_host_build():
    """Device rebake == host rebuild with the same transforms."""
    b = _scene()
    dyn = DynamicScene(b)
    sc = dyn.build()
    sc2, _ = dyn.rebake(sc)
    np.testing.assert_allclose(np.asarray(sc2.tri_pos),
                               np.asarray(sc.tri_pos), atol=1e-5)
    # now shift instance 0 and compare against a fresh host build
    dyn.transform(0).translation = (0.25, 0.5, -0.75)
    sc3, _ = dyn.rebake(sc)
    import dataclasses as dc
    shifted = _scene()
    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = (0.25, 0.5, -0.75)
    shifted.instances[0] = dc.replace(shifted.instances[0], transform=tf)
    ref = shifted.build()
    np.testing.assert_allclose(np.asarray(sc3.tri_pos),
                               np.asarray(ref.tri_pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sc3.lights.packed),
                               np.asarray(ref.lights.packed), atol=1e-4)


def test_dynamic_with_restir_tracks_motion():
    """dynamic+ReSTIR (round 5, un-fenced): reservoir visibility threads the
    rebaked occluder, so reuse tests against CURRENT geometry (≙ the
    reference running ReSTIR against the freshly rebuilt IAS every dirty
    frame, PTScene.cpp:77-160 + ReSTIR.cpp:65-233)."""
    from lumenrenderer_tpu.restir.di import RestirConfig

    rcfg = RestirConfig(candidates=8, num_bags=4, bag_size=64,
                        spatial_samples=2, spatial_iterations=1)
    cfg = RenderConfig(width=32, height=32, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", sort_secondary=False,
                       use_restir=True)
    dyn = DynamicScene(_scene())
    sc = dyn.build()
    cam = Camera.look_at(eye=(0, 0, 6), target=(0, 0, 0), fov_y_deg=40.0)
    r = Renderer(sc, cfg, accel="tiled", use_pallas=False, dynamic=dyn,
                 donate=False, restir_config=rcfg)
    st = r.init_state(0)
    st, aux0 = r.render_frame(st, cam)
    d0 = np.asarray(aux0["depth"]).reshape(32, 32)
    dyn.transform(0).translation = (1.5, 0.0, 0.0)
    st, aux1 = r.render_frame(st, cam)
    d1 = np.asarray(aux1["depth"]).reshape(32, 32)
    assert r._step._cache_size() == 1          # no retrace on rebake
    assert d0[16, 16] > 0.0 and d1[16, 16] == 0.0
    assert np.isfinite(np.asarray(st.accum)).all()
    # drift metric recorded on the rebake frame; small translation ->
    # bounded inflation, no rebuild advisory
    assert "cluster_drift" in r.frame_stats
    assert 1.0 <= r.frame_stats["cluster_drift"] < r.DRIFT_REBUILD_RATIO


def test_dynamic_under_mesh_matches_single_device():
    """dynamic+mesh (round 5, un-fenced): the rebaked clusters ride as a
    replicated shard_map arg; every chip traces the moved geometry."""
    from lumenrenderer_tpu.parallel import shard

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    cfg = RenderConfig(width=32, height=32, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", sort_secondary=False)
    cam = Camera.look_at(eye=(0, 0, 6), target=(0, 0, 0), fov_y_deg=40.0)

    def render_moved(mesh):
        dyn = DynamicScene(_scene())
        sc = dyn.build()
        r = Renderer(sc, cfg, accel="tiled", use_pallas=False, dynamic=dyn,
                     donate=False, mesh=mesh)
        st = r.init_state(0)
        st, _ = r.render_frame(st, cam)
        dyn.transform(0).translation = (1.5, 0.0, 0.0)
        st, aux = r.render_frame(st, cam)
        return np.asarray(aux["depth"]).reshape(32, 32)

    d_single = render_moved(None)
    d_mesh = render_moved(shard.make_mesh(jax.devices()[:8]))
    # depth is deterministic under jitter="center": sharded == single device
    np.testing.assert_allclose(d_mesh, d_single, atol=1e-5)
    assert d_mesh[16, 16] == 0.0 and d_mesh[16, 24:].max() > 0.0


def test_cluster_drift_advises_rebuild_on_large_excursion():
    dyn = DynamicScene(_scene())
    sc = dyn.build()
    cam = Camera.look_at(eye=(0, 0, 6), target=(0, 0, 0), fov_y_deg=40.0)
    cfg = RenderConfig(width=16, height=16, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", sort_secondary=False)
    r = Renderer(sc, cfg, accel="tiled", use_pallas=False, dynamic=dyn,
                 donate=False)
    st = r.init_state(0)
    st, _ = r.render_frame(st, cam)
    # fling the box far away: frozen cluster membership must inflate boxes
    dyn.transform(0).translation = (40.0, 0.0, 0.0)
    st, _ = r.render_frame(st, cam)
    assert r.frame_stats["cluster_drift"] > r.DRIFT_REBUILD_RATIO
