"""Mipmapped texture sampling (round 4, ≙ PTTexture.cpp:64-65 mipmapped
CUDA texture objects with linear mip filtering) + an end-to-end textured,
normal-mapped, alpha-carrying render through the full integrator.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lumenrenderer_tpu.core.camera import Camera
from lumenrenderer_tpu.integrator.wavefront import (
    RenderConfig, merge_channels, render_wavefront)
from lumenrenderer_tpu.scene import presets
from lumenrenderer_tpu.scene.materials import MaterialSpec
from lumenrenderer_tpu.scene.scene import SceneBuilder
from lumenrenderer_tpu.scene.textures import (
    build_texture_atlas, sample_bilinear, sample_trilinear)


def _checker(n, c0=0.0, c1=1.0, cell=1):
    yy, xx = np.mgrid[0:n, 0:n]
    img = np.where(((xx // cell + yy // cell) % 2) == 0, c0, c1).astype(
        np.float32)
    return np.repeat(img[..., None], 3, axis=-1)


def test_mip_chain_levels():
    """A 1x1-cell checker's level-1 mip is exactly the mean everywhere."""
    atlas = build_texture_atlas([_checker(8)])
    # texture id 0 (user id), slot 1
    assert int(atlas.n_mips[1]) == 4  # 8,4,2,1
    uv = jnp.asarray([[0.3, 0.7], [0.1, 0.2]])
    tid = jnp.zeros((2,), jnp.int32)
    # huge footprint -> last (1x1) level == global mean 0.5
    far = sample_trilinear(atlas, tid, uv, jnp.full((2,), 20.0))
    np.testing.assert_allclose(np.asarray(far[..., :3]), 0.5, atol=1e-6)


def test_trilinear_lod0_matches_bilinear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    atlas = build_texture_atlas([img])
    uv = jnp.asarray(rng.uniform(0, 1, (64, 2)), jnp.float32)
    tid = jnp.zeros((64,), jnp.int32)
    # lod_uv so texel lod = lod_uv + 0.5*log2(256) = lod_uv + 4 -> clamp at 0
    a = sample_trilinear(atlas, tid, uv, jnp.full((64,), -100.0))
    b = sample_bilinear(atlas, tid, uv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trilinear_monotone_smoothing():
    """Variance across samples must fall as lod rises (checker -> flat)."""
    atlas = build_texture_atlas([_checker(64)])
    rng = np.random.default_rng(1)
    uv = jnp.asarray(rng.uniform(0, 1, (512, 2)), jnp.float32)
    tid = jnp.zeros((512,), jnp.int32)
    prev = None
    for lod_uv in (-8.0, -4.0, -2.0, 0.0):
        s = sample_trilinear(atlas, tid, uv, jnp.full((512,), lod_uv))
        var = float(jnp.var(s[..., 0]))
        if prev is not None:
            assert var <= prev + 1e-6, (lod_uv, var, prev)
        prev = var


def test_odd_size_mips():
    img = np.ones((5, 3, 3), np.float32) * 0.25
    atlas = build_texture_atlas([img])
    uv = jnp.asarray([[0.5, 0.5]])
    s = sample_trilinear(atlas, jnp.zeros((1,), jnp.int32), uv,
                        jnp.full((1,), 10.0))
    np.testing.assert_allclose(np.asarray(s[..., :3]), 0.25, atol=1e-5)


def _textured_scene():
    """Quad floor with a checker base-color texture + bumpy normal map."""
    b = SceneBuilder(env_radiance=(0.0, 0.0, 0.0))
    # 64 cells of 4 texels: ~6.4 cells per world unit on the 40-unit floor,
    # well past Nyquist for a 48px render at distance -> strong minification
    checker = _checker(256, 0.2, 0.8, cell=4)
    tid = b.add_texture(checker)
    nm = np.zeros((8, 8, 3), np.float32)
    nm[..., 2] = 1.0  # flat +z normal map (identity perturbation)
    nm = nm * 0.5 + 0.5
    nid = b.add_texture(nm)
    m = b.add_material(MaterialSpec(base_color=(1.0, 1.0, 1.0), roughness=1.0,
                                    base_color_tex=tid, normal_tex=nid))
    lightm = b.add_material(MaterialSpec(base_color=(0, 0, 0),
                                         emissive=(40.0, 40.0, 40.0)))
    from lumenrenderer_tpu.scene.geometry import MeshHost
    pos, idx = presets.quad(
        (-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20))
    floor = MeshHost(positions=pos, indices=idx, material_ids=m,
                     uvs=np.array([(0, 0), (8, 0), (8, 8), (0, 8)],
                                  np.float32))
    b.add_instance(presets.InstanceHost(mesh=floor))
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(-1, 6, -1), (1, 6, -1), (1, 6, 1), (-1, 6, 1)], lightm)))
    return b.build()


def _render(sc, cfg, cam, spp=8):
    from lumenrenderer_tpu.accel import sah, traverse
    bvh = sah.build_sah(sc.tri_pos, leaf_size=8)
    isect, occl = traverse.bvh_intersectors(bvh)

    @jax.jit
    def f(key):
        out = render_wavefront(sc, isect, occl, cam, key, jnp.uint32(0), cfg)
        return merge_channels(out)

    acc = 0
    for i in range(spp):
        acc = acc + np.asarray(f(jax.random.PRNGKey(i)))
    return acc / spp


def test_e2e_textured_render_mip_vs_brute_mean():
    """Full integrator over a textured+normal-mapped floor: the mipmapped
    image must (a) be finite, (b) agree with the non-mip render in MEAN
    (energy-preserving filtering), (c) show lower pixel variance in the
    far-field (minification region)."""
    sc = _textured_scene()
    cam = Camera.look_at(eye=(0, 2.0, 14), target=(0, 0.0, 0),
                         fov_y_deg=50.0, aspect=1.0)
    w = h = 48
    base = dict(width=w, height=h, max_depth=2, bsdf="lambert",
                light_strategy="nee", rr_start_depth=99)
    img_mip = _render(sc, RenderConfig(**base, mipmaps=True), cam)
    img_raw = _render(sc, RenderConfig(**base, mipmaps=False), cam)
    assert np.isfinite(img_mip).all()
    lit = img_raw.mean(axis=1) > 1e-4
    assert lit.sum() > 200
    # energy: means agree within a few percent
    r = img_mip[lit].mean() / img_raw[lit].mean()
    assert abs(r - 1.0) < 0.08, r
    # smoothing: in the FAR band (top rows of the floor on screen), the
    # checker aliases pixel-to-pixel without mips; with mips the local
    # pixel-difference energy must drop
    im2 = img_mip.reshape(h, w, 3)
    ir2 = img_raw.reshape(h, w, 3)
    band_m = im2[h // 3:h // 2]
    band_r = ir2[h // 3:h // 2]
    tv = lambda a: np.abs(np.diff(a[..., 0], axis=1)).mean()
    assert tv(band_m) < 0.7 * tv(band_r), (tv(band_m), tv(band_r))


def test_textured_gradient_still_flows():
    """Material gradients must survive the trilinear path (texture modulates
    base_color multiplicatively; emission grad stays exact-linear)."""
    sc = _textured_scene()
    cam = Camera.look_at(eye=(0, 2.0, 10), target=(0, 0, 0), fov_y_deg=45.0)
    from lumenrenderer_tpu.accel import sah, traverse
    bvh = sah.build_sah(sc.tri_pos, leaf_size=8)
    isect, occl = traverse.bvh_intersectors(bvh)
    cfg = RenderConfig(width=12, height=12, max_depth=2, bsdf="lambert",
                       light_strategy="nee", rr_start_depth=99,
                       jitter="center", mipmaps=True)
    key = jax.random.PRNGKey(0)

    def loss(s):
        sc2 = sc.replace(materials=sc.materials.replace(
            emissive=sc.materials.emissive * s))
        out = render_wavefront(sc2, isect, occl, cam, key, jnp.uint32(0), cfg)
        return merge_channels(out).mean()

    f = jax.jit(loss)
    g = float(jax.jit(jax.grad(loss))(jnp.float32(1.0)))
    fd = float((f(jnp.float32(1.25)) - f(jnp.float32(0.75))) / 0.5)
    assert np.isfinite(g) and g > 0
    np.testing.assert_allclose(g, fd, rtol=2e-3)
