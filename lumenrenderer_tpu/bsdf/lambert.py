"""Lambertian BRDF — the M1 milestone BSDF and the analytic-test workhorse.

Interface convention shared by all BSDFs in this package (world space):
  wo — unit direction from the surface towards the viewer (= -ray.dir)
  wi — unit direction from the surface towards the light
  n  — unit shading normal, oriented towards wo's hemisphere by the caller

`eval` returns (f, pdf) where f is the BRDF value (3,) WITHOUT the cosine
term; `sample` returns (wi, f, pdf). pdf is in solid-angle measure.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import sampling
from ..core import vecmath as vm


def eval_brdf(base_color, n, wo, wi):
    cos_i = vm.dot(n, wi)
    cos_o = vm.dot(n, wo)
    valid = (cos_i > 0.0) & (cos_o > 0.0)
    f = jnp.where(valid[..., None], base_color / jnp.pi, 0.0)
    pdf = jnp.where(valid, sampling.cosine_hemisphere_pdf(cos_i), 0.0)
    return f, pdf


def sample_brdf(base_color, n, wo, u):
    local = sampling.sample_cosine_hemisphere(u)
    wi = vm.to_world(local, n)
    f, pdf = eval_brdf(base_color, n, wo, wi)
    return wi, f, pdf
