"""Texture atlas with gather-based bilinear sampling.

TPU-native replacement for the reference's CUDA mipmapped texture objects
(`Framework/PTTexture.h:40`, `Framework/GPUTexture.cpp`) and its default
white/normal fallback textures (`Renderer/LumenRenderer.cpp`).

TPUs have no texture units; sampling is 4 gathers from a flat texel pool.
All textures (any sizes) are concatenated into one (N_texels, 4) float32 array
with per-texture (offset, width, height) records, so sampling is
shape-static and vmappable. Wrap mode is REPEAT like the reference.
"""
from __future__ import annotations

from typing import List

import chex
import jax.numpy as jnp
import numpy as np


@chex.dataclass(frozen=True)
class TextureAtlas:
    texels: jnp.ndarray   # (P,4) float32 RGBA, P >= 1
    offset: jnp.ndarray   # (K,) int32 flat offset of texture k
    width: jnp.ndarray    # (K,) int32
    height: jnp.ndarray   # (K,) int32

    @property
    def count(self) -> int:
        return self.offset.shape[0]


def build_texture_atlas(images: List[np.ndarray]) -> TextureAtlas:
    """Pack images ((H,W,3|4) uint8 [sRGB-as-linear passthrough] or float32)
    into a flat atlas. Index 0 is always a 1x1 white texture (the reference's
    default-white fallback)."""
    blobs = [np.ones((1, 1, 4), np.float32)]
    for img in images:
        a = np.asarray(img)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 255.0
        a = a.astype(np.float32)
        if a.ndim == 2:
            a = a[..., None]
        if a.shape[-1] == 1:
            a = np.concatenate([a, a, a, np.ones_like(a[..., :1])], axis=-1)
        elif a.shape[-1] == 3:
            a = np.concatenate([a, np.ones_like(a[..., :1])], axis=-1)
        blobs.append(a[..., :4])
    offs, ws, hs, flat = [], [], [], []
    cursor = 0
    for b in blobs:
        h, w = b.shape[:2]
        offs.append(cursor)
        ws.append(w)
        hs.append(h)
        flat.append(b.reshape(-1, 4))
        cursor += h * w
    return TextureAtlas(
        texels=jnp.asarray(np.concatenate(flat, axis=0)),
        offset=jnp.asarray(np.array(offs, np.int32)),
        width=jnp.asarray(np.array(ws, np.int32)),
        height=jnp.asarray(np.array(hs, np.int32)),
    )


def sample_bilinear(
    atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear REPEAT-wrapped sample. tex_id: (...,) int32 (user texture ids,
    i.e. builder-returned ids; -1 = none -> white). uv: (...,2). -> (...,4)."""
    # builder ids are offset by 1 (slot 0 = white); -1 maps to slot 0.
    slot = jnp.clip(tex_id + 1, 0, atlas.count - 1)
    w = atlas.width[slot].astype(jnp.float32)
    h = atlas.height[slot].astype(jnp.float32)
    off = atlas.offset[slot]
    iw = atlas.width[slot]
    ih = atlas.height[slot]
    # texel-space coords, REPEAT wrap
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    def fetch(xi, yi):
        xw = jnp.mod(xi, iw)
        yw = jnp.mod(yi, ih)
        return atlas.texels[off + yw * iw + xw]

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy
