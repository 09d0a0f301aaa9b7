"""Camera and motion-vector tests."""
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.core.camera import Camera, generate_primary_rays, motion_vectors


def test_center_ray_points_at_target():
    cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), fov_y_deg=45.0)
    o, d = generate_primary_rays(cam, 9, 9, jnp.uint32(0), jitter="center")
    c = 4 * 9 + 4  # center pixel
    np.testing.assert_allclose(np.asarray(o[c]), [0, 0, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[c]), [0, 0, -1], atol=1e-6)


def test_ray_directions_unit_norm():
    cam = Camera.look_at(eye=(1, 2, 3), target=(0, 0, 0), aspect=1.5)
    _, d = generate_primary_rays(cam, 16, 8, jnp.uint32(3), jitter="halton")
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=-1)), 1.0, atol=1e-5)


def test_fov_edges():
    cam = Camera.look_at(eye=(0, 0, 1), target=(0, 0, 0), fov_y_deg=90.0)
    o, d = generate_primary_rays(cam, 101, 101, jnp.uint32(0), jitter="center")
    d = np.asarray(d).reshape(101, 101, 3)
    # at 90 deg fov, top-center ray should be ~45 deg up
    top = d[0, 50]
    angle = np.degrees(np.arctan2(top[1], -top[2]))
    assert abs(angle - 44.5) < 1.0  # half-pixel offset


def test_motion_vectors_static_camera_zero():
    cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), fov_y_deg=45.0)
    w = h = 32
    o, d = generate_primary_rays(cam, w, h, jnp.uint32(0), jitter="center")
    # points on the z=0 plane along each ray
    t = 5.0 / np.maximum(-np.asarray(d)[:, 2], 1e-6)
    pos = np.asarray(o) + t[:, None] * np.asarray(d)
    mv = motion_vectors(jnp.asarray(pos), jnp.ones(w * h, bool), cam, w, h)
    # static camera: reprojection lands on the same pixel
    assert np.abs(np.asarray(mv)).max() < 0.51


def test_motion_vectors_translated_camera():
    cam0 = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), fov_y_deg=45.0)
    cam1 = Camera.look_at(eye=(0.1, 0, 5), target=(0.1, 0, 0), fov_y_deg=45.0)
    cam1 = cam1.with_previous(cam0, fov_y_deg=45.0, aspect=1.0)
    w = h = 32
    o, d = generate_primary_rays(cam1, w, h, jnp.uint32(0), jitter="center")
    t = 5.0 / np.maximum(-np.asarray(d)[:, 2], 1e-6)
    pos = np.asarray(o) + t[:, None] * np.asarray(d)
    mv = np.asarray(motion_vectors(jnp.asarray(pos), jnp.ones(w * h, bool), cam1, w, h))
    # camera moved +x, so prev pixel of the same world point is to the right
    assert mv[:, 0].mean() > 0.1
    assert np.abs(mv[:, 1]).max() < 0.6
