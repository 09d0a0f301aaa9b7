"""Sparse volume grids (round 5): index+apron-brick layout vs dense oracle,
memory ∝ occupancy at 512³ logical, and the pure-python .nvdb reader
against a real NanoVDB v29.3 asset (tests/data/sphere_fog.nvdb, generated
with the SDK the reference vendors — see tools/gen_nvdb_asset.cpp).
≙ `PTVolume.cpp:47-105` (OpenVDB → NanoVDB → device)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.volume import grid as vgrid
from lumenrenderer_tpu.volume import march, nvdb

ASSET = os.path.join(os.path.dirname(__file__), "data", "sphere_fog.nvdb")


def _blob(res, seed=0):
    rng = np.random.default_rng(seed)
    g = (np.mgrid[0:res, 0:res, 0:res].astype(np.float32) + 0.5) / res - 0.5
    r = np.sqrt((g**2).sum(0))
    d = np.clip((0.35 - r) / 0.1, 0.0, 1.0)
    return (d * rng.uniform(0.5, 1.0, d.shape)).astype(np.float32)


@pytest.mark.parametrize("res", [16, 33])
def test_sparse_matches_dense(res):
    d = _blob(res)
    dense = vgrid.make_volume_set([d], [(-1, -1, -1)], [(1, 1, 1)])
    sparse = vgrid.build_sparse([d], [(-1, -1, -1)], [(1, 1, 1)])
    pos = jnp.asarray(
        np.random.default_rng(1).uniform(-1.2, 1.2, (500, 3)).astype(np.float32))
    vid = jnp.zeros(500, jnp.int32)
    a = vgrid.sample_density(dense, vid, pos)
    b = vgrid.sample_density(sparse, vid, pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert float(jnp.abs(vgrid.density_majorant(dense)
                         - vgrid.density_majorant(sparse))[0]) < 1e-6


def test_sparse_memory_scales_with_occupancy():
    """512³ logical shell at ≤5% occupancy: bricks ∝ occupied cells, index
    is the only dense structure (64³ int32 = 1 MB)."""
    nb = 64                          # 64³ bricks = 512³ logical voxels
    index = np.zeros((1, nb, nb, nb), np.int32)
    g = (np.mgrid[0:nb, 0:nb, 0:nb].astype(np.float32) + 0.5) / nb - 0.5
    shell = np.abs(np.sqrt((g**2).sum(0)) - 0.4) < 0.012  # thin shell
    occ = np.argwhere(shell)
    index[0, occ[:, 0], occ[:, 1], occ[:, 2]] = np.arange(1, len(occ) + 1)
    bricks = np.zeros((len(occ) + 1, 9, 9, 9), np.float32)
    bricks[1:] = 0.7
    vol = vgrid.SparseVolumeSet(
        index=jnp.asarray(index), bricks=jnp.asarray(bricks),
        aabb_lo=jnp.asarray([[-1.0, -1, -1]]), aabb_hi=jnp.asarray([[1.0, 1, 1]]),
        sigma_t=jnp.ones(1), albedo=jnp.full(1, 0.9),
        res=(nb * 8 + 1,) * 3)
    frac = len(occ) / nb**3
    assert frac < 0.05, frac
    dense_bytes = (nb * 8) ** 3 * 4
    sparse_bytes = vol.index.size * 4 + vol.bricks.size * 4
    assert sparse_bytes < 0.1 * dense_bytes
    # a point on the shell reads 0.7; the hollow center reads 0
    on_shell = jnp.asarray([[0.8 * 0.5 * 2 - 0.0, 0.0, 0.0]]) * 0.0 + jnp.asarray([[0.8, 0.0, 0.0]])
    d_shell = vgrid.sample_density(vol, jnp.zeros(1, jnp.int32), on_shell)
    d_center = vgrid.sample_density(vol, jnp.zeros(1, jnp.int32),
                                    jnp.zeros((1, 3)))
    assert float(d_shell[0]) == pytest.approx(0.7, abs=1e-5)
    assert float(d_center[0]) == 0.0


def test_sparse_density_gradient_flows():
    d = _blob(16)
    sparse = vgrid.build_sparse([d], [(-1, -1, -1)], [(1, 1, 1)])
    pos = jnp.asarray([[0.05, 0.0, -0.02], [0.2, 0.1, 0.0]])

    def loss(bricks):
        v = sparse.replace(bricks=bricks)
        return jnp.sum(vgrid.sample_density(v, jnp.zeros(2, jnp.int32), pos))

    g = jax.grad(loss)(sparse.bricks)
    assert float(jnp.abs(g).sum()) > 0.0 and np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# .nvdb reader vs the real NanoVDB-written asset
# ---------------------------------------------------------------------------

def test_nvdb_parse_metadata_and_values():
    grids = nvdb.load_nvdb(ASSET)
    assert len(grids) == 1
    g = grids[0]
    assert g.name == "sphere_fog"
    assert g.voxel_size[0] == pytest.approx(1.0 / 16.0)
    # ground truth printed by the SDK generator (tools/gen_nvdb_asset.cpp)
    assert g.voxel_count == 8733
    dense = g.to_dense()
    lo = np.asarray(g.index_bbox_min)

    def at(i, j, k):
        return dense[i - lo[0], j - lo[1], k - lo[2]]

    assert at(0, 0, 0) == pytest.approx(1.0)
    assert at(4, 2, -4) == pytest.approx(1.0)
    assert at(8, 4, -8) == pytest.approx(0.266667, abs=1e-5)
    assert at(12, 6, -12) == pytest.approx(0.0)


def test_nvdb_to_sparse_volume_renders_and_matches_dense():
    vol = nvdb.sparse_from_nvdb(ASSET)
    g = nvdb.load_nvdb(ASSET)[0]
    dense_np = g.to_dense()
    dense = vgrid.make_volume_set(
        [dense_np], [np.asarray(vol.aabb_lo[0])], [np.asarray(vol.aabb_hi[0])])
    vol = vol.replace(index=jnp.asarray(vol.index),
                      bricks=jnp.asarray(vol.bricks),
                      aabb_lo=jnp.asarray(vol.aabb_lo),
                      aabb_hi=jnp.asarray(vol.aabb_hi),
                      sigma_t=jnp.asarray(vol.sigma_t),
                      albedo=jnp.asarray(vol.albedo))
    pts = jnp.asarray(np.random.default_rng(2).uniform(
        np.asarray(vol.aabb_lo[0]) - 0.1, np.asarray(vol.aabb_hi[0]) + 0.1,
        (400, 3)).astype(np.float32))
    vid = jnp.zeros(400, jnp.int32)
    a = vgrid.sample_density(dense, vid, pts)
    b = vgrid.sample_density(vol, vid, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # transmittance through the fog sphere center attenuates
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    t = march.transmittance_only(
        vol, o, d, jnp.full((1,), 1e-3), jnp.full((1,), 1e8), steps=32)
    assert 0.0 < float(t[0]) < 0.7


def test_sparse_through_scene_builder():
    from lumenrenderer_tpu.scene.scene import SceneBuilder
    from lumenrenderer_tpu.scene.materials import MaterialSpec
    from lumenrenderer_tpu.scene import presets

    b = SceneBuilder(env_radiance=(1.0, 1.0, 1.0))
    m = b.add_material(MaterialSpec())
    b.add_instance(presets.InstanceHost(mesh=presets.make_quad_mesh(
        [(-1000, -1000, -500), (-999, -1000, -500), (-999, -999, -500),
         (-1000, -999, -500)], m)))
    b.add_volume(_blob(16), (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
                 sigma_t=2.0, sparse=True)
    sc = b.build()
    assert isinstance(sc.volumes, vgrid.SparseVolumeSet)
