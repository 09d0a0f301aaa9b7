"""Next-event estimation: light sampling + shadow-ray construction.

TPU-native equivalent of `ShadeDirect`
(`CUDAKernels/WaveFrontKernels/GPUShadeDirect.cu:42-153`): pick a triangle
light, sample a point on it, evaluate the BSDF and geometry term, and emit a
shadow ray carrying the *unshadowed* contribution; occlusion later zeroes it
(≙ `ShadowRaysRayGen`, `Shaders/WaveFrontShaders.cu:114-179`).

Light radiance is gathered differentiably from the scene (gradients w.r.t.
emission flow through here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import sampling
from ..core import vecmath as vm
from ..scene.scene import SceneData

SHADOW_EPS = 1e-3


class LightSample(NamedTuple):
    light_idx: jnp.ndarray   # (R,) int32
    point: jnp.ndarray       # (R,3) position on light
    normal: jnp.ndarray      # (R,3) light geometric normal
    radiance: jnp.ndarray    # (R,3)
    pdf_area: jnp.ndarray    # (R,) pdf in area measure (select * point)
    wi: jnp.ndarray          # (R,3) unit dir surface -> light
    dist: jnp.ndarray        # (R,)
    cos_light: jnp.ndarray   # (R,) |cos| at the light (0 if behind)
    valid: jnp.ndarray       # (R,) bool


def all_light_radiance(scene: SceneData) -> jnp.ndarray:
    """Dense (L,3) differentiable radiance of every light row — computed
    once per frame so per-ray light sampling needs a single packed gather
    instead of 6+ (TPU gathers have a high fixed cost)."""
    lights = scene.lights
    return scene.light_radiance(jnp.arange(lights.capacity, dtype=jnp.int32))


def build_light_cdf(scene: SceneData, light_rad_all=None):
    """Power-weighted light-selection CDF, built once per frame.

    ≙ the reference's per-frame radiance CDF (`ReSTIR::BuildCDF`,
    `Framework/ReSTIR.cpp:235-262`) that `GPUShadeDirect.cu:83` samples
    from: weights = luminance * area, cumsum replaces thrust inclusive_scan.
    Returns (cdf (L,), sel_pdf (L,)); sampling machinery, detached.
    """
    lights = scene.lights
    idx = jnp.arange(lights.capacity)
    rad = light_rad_all if light_rad_all is not None else scene.light_radiance(idx)
    w = vm.luminance(jax.lax.stop_gradient(rad)) * lights.area
    w = jnp.where(idx < lights.count, jnp.maximum(w, 0.0), 0.0)
    total = jnp.sum(w)
    # degenerate all-zero: uniform over valid lights
    w = jnp.where(total > 0, w, (idx < lights.count).astype(jnp.float32))
    cdf = jnp.cumsum(w)
    total = jnp.maximum(cdf[-1], 1e-20)
    return cdf / total, w / total


def sample_light(
    scene: SceneData,
    u: jnp.ndarray,
    shading_pos: jnp.ndarray,
    light_rad_all: jnp.ndarray | None = None,
    cdf: jnp.ndarray | None = None,
    sel_pdf_all: jnp.ndarray | None = None,
) -> LightSample:
    """Pick one of the scene's triangle lights and a point on it.

    u: (R,3) uniforms — u[:,0] selects the light, u[:,1:3] the point.
    With (cdf, sel_pdf_all) the selection is radiance-weighted
    (≙ `GPUShadeDirect.cu:83` CDF sampling); without, uniform.
    """
    lights = scene.lights
    n_lights = jnp.maximum(lights.count, 1)
    if cdf is not None:
        idx = jnp.clip(
            jnp.searchsorted(cdf, u[:, 0], side="right"), 0, cdf.shape[0] - 1
        ).astype(jnp.int32)
        sel_pdf = sel_pdf_all[idx]
    else:
        idx = jnp.minimum(
            (u[:, 0] * n_lights.astype(jnp.float32)).astype(jnp.int32),
            n_lights - 1,
        )
        sel_pdf = jnp.full(idx.shape, 1.0, jnp.float32) / n_lights.astype(
            jnp.float32
        )
    bary = sampling.sample_triangle(u[:, 1:3])
    row = lights.packed[idx]                       # ONE gather: p0,e1,e2,n,area
    p0, e1, e2 = row[:, 0:3], row[:, 3:6], row[:, 6:9]
    point = p0 + bary[:, 1:2] * e1 + bary[:, 2:3] * e2
    nrm = row[:, 9:12]
    area = row[:, 12]
    rad = (
        light_rad_all[idx] if light_rad_all is not None else scene.light_radiance(idx)
    )

    to_light = point - shading_pos
    dist = vm.length(to_light)
    wi = to_light / jnp.maximum(dist[..., None], 1e-8)
    cos_light = vm.dot(nrm, -wi)  # light emits from its front face
    pdf_area = sel_pdf / jnp.maximum(area, 1e-12)
    valid = (
        (lights.count > 0)
        & (cos_light > 1e-6)
        & (area > 1e-12)
        & (dist > 1e-5)
        & (sel_pdf > 0.0)
    )
    return LightSample(
        light_idx=idx,
        point=point,
        normal=nrm,
        radiance=rad,
        pdf_area=pdf_area,
        wi=wi,
        dist=dist,
        cos_light=jnp.maximum(cos_light, 0.0),
        valid=valid,
    )


def pdf_solid_angle(ls: LightSample) -> jnp.ndarray:
    """Convert the area pdf to solid-angle measure at the shading point."""
    return ls.pdf_area * ls.dist * ls.dist / jnp.maximum(ls.cos_light, 1e-6)


def light_pdf_solid_angle(
    scene: SceneData,
    shading_pos: jnp.ndarray,
    wi: jnp.ndarray,
    hit_t: jnp.ndarray,
    hit_tri: jnp.ndarray,
    sel_pdf_all: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Solid-angle pdf that NEE would have used for direction wi hitting
    triangle `hit_tri` at distance `hit_t` (for MIS weighting of BSDF hits).

    Uses the precomputed (T,) tri→light inverse table, a single gather.
    sel_pdf_all: per-light selection pdf (CDF mode); None = uniform.
    """
    lights = scene.lights
    row = lights.tri_to_light[jnp.maximum(hit_tri, 0)]
    found = (hit_tri >= 0) & (row >= 0)
    row = jnp.maximum(row, 0)
    prow = lights.packed[row]
    area = prow[:, 12]
    nrm = prow[:, 9:12]
    cos_l = jnp.maximum(vm.dot(nrm, -wi), 0.0)
    if sel_pdf_all is not None:
        sel = sel_pdf_all[row]
    else:
        sel = 1.0 / jnp.maximum(lights.count, 1).astype(jnp.float32)
    pdf_a = sel / jnp.maximum(area, 1e-12)
    pdf_sa = pdf_a * hit_t * hit_t / jnp.maximum(cos_l, 1e-6)
    return jnp.where(found & (cos_l > 1e-6), pdf_sa, 0.0)
