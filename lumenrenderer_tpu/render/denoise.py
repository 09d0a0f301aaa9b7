"""Edge-avoiding À-Trous wavelet denoiser.

TPU-native replacement for the reference's denoiser slots (OptiX AI
denoiser `Framework/OptixDenoiserWrapper.{h,cpp}`, NRD/DLSS via DX11
`Framework/Nvidia/*`): those are closed black boxes behind an interop
layer; here denoising is an open, differentiable JAX image filter driven by
the same feature buffers the reference feeds its denoisers (color, albedo,
normal, depth — `WaveFrontRenderer.cpp:614-649` snapshot names them).

Algorithm: Dammertz et al. 2010 edge-avoiding À-Trous with SVGF-style
edge-stopping on normal/depth/luminance; 5 dilated 5x5 passes. All
convolution-shaped — XLA fuses it tightly on the VPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0  # numpy: stays concrete under jit


def _shift2(img, dy, dx):
    """Edge-clamped 2D shift of (H,W,C)."""
    h, w = img.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


@partial(jax.jit, static_argnames=("iterations",))
def atrous_denoise(
    color,       # (H,W,3) radiance
    albedo,      # (H,W,3)
    normal,      # (H,W,3)
    depth,       # (H,W)
    iterations: int = 5,
    sigma_color: float = 4.0,
    sigma_normal: float = 128.0,
    sigma_depth: float = 1.0,
):
    """Returns denoised (H,W,3). Demodulates albedo first (standard
    practice so texture detail is preserved) and re-modulates after."""
    alb_safe = jnp.maximum(albedo, 1e-3)
    demod = color / alb_safe
    lum = (
        demod[..., 0] * 0.2126 + demod[..., 1] * 0.7152 + demod[..., 2] * 0.0722
    )

    out = demod
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros_like(depth)
        lum_c = (
            out[..., 0] * 0.2126 + out[..., 1] * 0.7152 + out[..., 2] * 0.0722
        )
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                h = float(_KERNEL[ky] * _KERNEL[kx])
                c_s = _shift2(out, dy, dx)
                n_s = _shift2(normal, dy, dx)
                d_s = _shift2(depth[..., None], dy, dx)[..., 0]
                l_s = (
                    c_s[..., 0] * 0.2126 + c_s[..., 1] * 0.7152 + c_s[..., 2] * 0.0722
                )
                w_n = jnp.maximum(jnp.sum(n_s * normal, -1), 0.0) ** sigma_normal
                w_d = jnp.exp(
                    -jnp.abs(d_s - depth) / (sigma_depth * jnp.maximum(depth, 1e-3))
                )
                w_l = jnp.exp(-jnp.abs(l_s - lum_c) / sigma_color)
                w = h * w_n * w_d * w_l
                acc = acc + c_s * w[..., None]
                wacc = wacc + w
        out = acc / jnp.maximum(wacc, 1e-8)[..., None]
    return out * alb_safe


def denoise_frame(accum, aovs, width: int, height: int, **kw):
    """Convenience wrapper over flat (N,·) renderer outputs."""
    c = accum.reshape(height, width, 3)
    a = aovs["albedo"].reshape(height, width, 3)
    n = aovs["normal"].reshape(height, width, 3)
    d = aovs["depth"].reshape(height, width)
    return atrous_denoise(c, a, n, d, **kw).reshape(-1, 3)
