"""Built-in test scenes (≙ the reference's scene presets,
`Sandbox/src/OutputLayer.cpp:425-480`). Used by tests and benchmarks."""
from __future__ import annotations

import numpy as np

from ..core.camera import Camera
from .geometry import EmissionMode, InstanceHost, MeshHost
from .materials import MaterialSpec
from .scene import SceneBuilder, SceneData


def quad(p00, p10, p11, p01):
    """Two-triangle quad from 4 corners (CCW front face)."""
    pos = np.array([p00, p10, p11, p01], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return pos, idx


def make_quad_mesh(corners, material_id: int) -> MeshHost:
    pos, idx = quad(*corners)
    return MeshHost(positions=pos, indices=idx, material_ids=material_id)


def cornell_box(
    light_radiance=(15.0, 15.0, 15.0),
    with_blocks: bool = True,
    bsdf_extras: bool = False,
):
    """The classic Cornell box in [0,1]^3, camera on +z looking at -z.

    Returns (SceneBuilder, camera_factory(aspect)->Camera).
    bsdf_extras: make one block metallic-glossy for GGX tests.
    """
    b = SceneBuilder()
    white = b.add_material(MaterialSpec(base_color=(0.73, 0.73, 0.73), roughness=1.0))
    red = b.add_material(MaterialSpec(base_color=(0.65, 0.05, 0.05), roughness=1.0))
    green = b.add_material(MaterialSpec(base_color=(0.12, 0.45, 0.15), roughness=1.0))
    light = b.add_material(
        MaterialSpec(base_color=(0.0, 0.0, 0.0), emissive=tuple(light_radiance))
    )
    glossy = b.add_material(
        MaterialSpec(base_color=(0.8, 0.6, 0.2), metallic=1.0, roughness=0.25)
    )

    def add_quad(corners, mat, mode=EmissionMode.ENABLED):
        b.add_instance(
            InstanceHost(mesh=make_quad_mesh(corners, mat), emission_mode=mode)
        )

    # floor (y=0, normal +y): cross(e1,e2) must be +y
    add_quad([(0, 0, 1), (1, 0, 1), (1, 0, 0), (0, 0, 0)], white)
    # ceiling (y=1, normal -y)
    add_quad([(0, 1, 0), (1, 1, 0), (1, 1, 1), (0, 1, 1)], white)
    # back wall (z=0, normal +z)
    add_quad([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)], white)
    # left wall (x=0, normal +x) red
    add_quad([(0, 0, 0), (0, 1, 0), (0, 1, 1), (0, 0, 1)], red)
    # right wall (x=1, normal -x) green
    add_quad([(1, 0, 0), (1, 0, 1), (1, 1, 1), (1, 1, 0)], green)
    # area light: small quad under the ceiling, facing down (-y)
    ly = 0.999
    add_quad(
        [(0.35, ly, 0.35), (0.65, ly, 0.35), (0.65, ly, 0.65), (0.35, ly, 0.65)],
        light,
    )

    if with_blocks:
        tall_mat = glossy if bsdf_extras else white
        b.add_instance(
            InstanceHost(mesh=box_mesh((0.15, 0.0, 0.10), (0.45, 0.6, 0.40), tall_mat))
        )
        b.add_instance(
            InstanceHost(mesh=box_mesh((0.55, 0.0, 0.50), (0.85, 0.3, 0.80), white))
        )

    def make_camera(aspect: float = 1.0) -> Camera:
        return Camera.look_at(
            eye=(0.5, 0.5, 2.45),
            target=(0.5, 0.5, 0.0),
            fov_y_deg=28.0,
            aspect=aspect,
        )

    return b, make_camera


def box_mesh(lo, hi, material_id: int) -> MeshHost:
    """Axis-aligned box with outward faces."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    faces = [
        # -z
        [(x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0)],
        # +z
        [(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)],
        # -x
        [(x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)],
        # +x
        [(x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1)],
        # -y
        [(x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)],
        # +y
        [(x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0)],
    ]
    pos = []
    idx = []
    for f in faces:
        base = len(pos)
        pos.extend(f)
        idx.append([base, base + 1, base + 2])
        idx.append([base, base + 2, base + 3])
    return MeshHost(
        positions=np.array(pos, np.float32),
        indices=np.array(idx, np.int32),
        material_ids=material_id,
    )


def furnace_scene(albedo: float = 0.5, env: float = 1.0):
    """A single large quad filling the view, lit only by a constant
    environment — every cosine-sampled bounce escapes. Analytic value at
    depth D with NEE off and Lambert albedo rho: sum_{k=1..D-1} handled by
    test; used for exact energy-conservation checks."""
    b = SceneBuilder(env_radiance=(env, env, env))
    m = b.add_material(MaterialSpec(base_color=(albedo, albedo, albedo), roughness=1.0))
    b.add_instance(
        InstanceHost(
            mesh=make_quad_mesh(
                [(-50, -50, 0), (50, -50, 0), (50, 50, 0), (-50, 50, 0)], m
            )
        )
    )

    def make_camera(aspect: float = 1.0) -> Camera:
        return Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), fov_y_deg=40.0, aspect=aspect)

    return b, make_camera


def build(builder_and_cam, aspect: float = 1.0):
    b, cam_f = builder_and_cam
    return b.build(), cam_f(aspect)
