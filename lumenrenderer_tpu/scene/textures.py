"""Texture atlas with gather-based bilinear/trilinear (mipmapped) sampling.

TPU-native replacement for the reference's CUDA mipmapped texture objects
(`Framework/PTTexture.cpp:64-65` builds mipmapped arrays with linear mip
filtering; `Framework/GPUTexture.cpp`) and its default white/normal fallback
textures (`Renderer/LumenRenderer.cpp`).

TPUs have no texture units; sampling is 4 (bilinear) or 8 (trilinear)
gathers from a flat texel pool. All textures AND their full mip chains (2x2
box-filtered) are concatenated into one (N_texels, 4) float32 array with
per-texture per-level offset records, so sampling is shape-static and
vmappable. Wrap mode is REPEAT like the reference.
"""
from __future__ import annotations

from typing import List

import chex
import jax.numpy as jnp
import numpy as np

MAX_MIPS = 14  # enough for 8192x8192


@chex.dataclass(frozen=True)
class TextureAtlas:
    texels: jnp.ndarray       # (P,4) float32 RGBA, P >= 1
    offset: jnp.ndarray       # (K,) int32 flat offset of texture k, level 0
    width: jnp.ndarray        # (K,) int32 level-0 width
    height: jnp.ndarray       # (K,) int32 level-0 height
    mip_offset: jnp.ndarray   # (K,MAX_MIPS) int32 per-level offsets (clamped
                              # to the last real level)
    n_mips: jnp.ndarray       # (K,) int32 number of real levels (>=1)

    @property
    def count(self) -> int:
        return self.offset.shape[0]


def _downsample2(a: np.ndarray) -> np.ndarray:
    """2x2 box filter producing max(1, d//2) dims — the CUDA mipmapped-array
    convention the reference relies on, and the dims `_bilinear_level`
    computes as width>>level (floor-div by 2 composes: (w//2)//2 == w>>2).
    ADVICE r4: the earlier edge-pad-to-even variant stored a 3x2 level for a
    5x3 image while sampling computed 2x1, corrupting stride and wrap for
    every level >= 1 of non-power-of-two textures. Odd trailing texels are
    cropped from the filter footprint."""
    h, w = a.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    a = a[: nh * 2 if h > 1 else 1, : nw * 2 if w > 1 else 1]
    if h == 1:
        return a.reshape(1, nw, 2, -1).mean(axis=2)
    if w == 1:
        return a.reshape(nh, 2, 1, -1).mean(axis=1)
    return a.reshape(nh, 2, nw, 2, -1).mean(axis=(1, 3))


def build_texture_atlas(images: List[np.ndarray],
                        mips: bool = True) -> TextureAtlas:
    """Pack images ((H,W,3|4) uint8 [sRGB-as-linear passthrough] or float32)
    into a flat atlas with full mip chains. Index 0 is always a 1x1 white
    texture (the reference's default-white fallback)."""
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
    offs, ws, hs, flat, mip_offs, nmips = [], [], [], [], [], []
    cursor = 0
    for b in blobs:
        h, w = b.shape[:2]
        offs.append(cursor)
        ws.append(w)
        hs.append(h)
        levels = [b]
        if mips:
            while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
                levels.append(_downsample2(levels[-1]))
        row = []
        for lv in levels:
            row.append(cursor)
            flat.append(lv.reshape(-1, 4))
            cursor += lv.shape[0] * lv.shape[1]
        nmips.append(len(levels))
        row += [row[-1]] * (MAX_MIPS - len(row))
        mip_offs.append(row[:MAX_MIPS])
    return TextureAtlas(
        texels=jnp.asarray(np.concatenate(flat, axis=0)),
        offset=jnp.asarray(np.array(offs, np.int32)),
        width=jnp.asarray(np.array(ws, np.int32)),
        height=jnp.asarray(np.array(hs, np.int32)),
        mip_offset=jnp.asarray(np.array(mip_offs, np.int32)),
        n_mips=jnp.asarray(np.array(nmips, np.int32)),
    )


def _bilinear_level(atlas: TextureAtlas, slot, level, uv) -> jnp.ndarray:
    """Bilinear REPEAT-wrapped sample at an integer mip level (clamped)."""
    level = jnp.clip(level, 0, atlas.n_mips[slot] - 1)
    off = atlas.mip_offset[slot, level]
    iw = jnp.maximum(atlas.width[slot] >> level, 1)
    ih = jnp.maximum(atlas.height[slot] >> level, 1)
    w = iw.astype(jnp.float32)
    h = ih.astype(jnp.float32)
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


def sample_bilinear(
    atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear REPEAT-wrapped level-0 sample. tex_id: (...,) int32 (user
    texture ids, i.e. builder-returned ids; -1 = none -> white). uv: (...,2).
    -> (...,4)."""
    # builder ids are offset by 1 (slot 0 = white); -1 maps to slot 0.
    slot = jnp.clip(tex_id + 1, 0, atlas.count - 1)
    return _bilinear_level(atlas, slot, jnp.zeros_like(slot), uv)


def sample_trilinear(
    atlas: TextureAtlas, tex_id: jnp.ndarray, uv: jnp.ndarray,
    lod_uv: jnp.ndarray,
) -> jnp.ndarray:
    """Trilinearly filtered mipmapped sample (≙ the reference's
    cudaFilterModeLinear mipmapped texture objects, `PTTexture.cpp:64-65`).

    lod_uv: (...,) log2 of the sampling footprint in UV space (i.e.
    log2(world_footprint) + 0.5*log2(A_uv/A_world) from the hit). The
    texel-space LOD adds 0.5*log2(W*H) per texture here.
    """
    slot = jnp.clip(tex_id + 1, 0, atlas.count - 1)
    wh = (atlas.width[slot] * atlas.height[slot]).astype(jnp.float32)
    lod = lod_uv + 0.5 * jnp.log2(jnp.maximum(wh, 1.0))
    lod = jnp.clip(lod, 0.0, (atlas.n_mips[slot] - 1).astype(jnp.float32))
    l0 = jnp.floor(lod).astype(jnp.int32)
    fl = (lod - l0.astype(jnp.float32))[..., None]
    c0 = _bilinear_level(atlas, slot, l0, uv)
    c1 = _bilinear_level(atlas, slot, l0 + 1, uv)
    return c0 * (1.0 - fl) + c1 * fl
