"""M2: BVH builders (device LBVH + host SAH) + traversal equality vs brute."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.accel import brute, lbvh, sah, traverse
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


def test_build_shapes():
    rng = np.random.default_rng(0)
    tris = jnp.asarray(random_tris(rng, 37))
    bvh = lbvh.build_lbvh(tris, leaf_size=4)
    m = bvh.num_leaves
    assert m == 16  # ceil(37/4)=10 -> pow2 16
    assert bvh.node_lo.shape == (2 * m - 1, 3)
    assert bvh.tri_p0.shape == (m * 4, 3)
    # all real triangles present exactly once
    ids = np.asarray(bvh.tri_id)
    assert sorted(ids[ids >= 0].tolist()) == list(range(37))


def test_root_aabb_contains_scene():
    rng = np.random.default_rng(1)
    tris = random_tris(rng, 100)
    bvh = lbvh.build_lbvh(jnp.asarray(tris))
    np.testing.assert_allclose(np.asarray(bvh.node_lo[0]), tris.reshape(-1, 3).min(0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bvh.node_hi[0]), tris.reshape(-1, 3).max(0), atol=1e-5)


@pytest.mark.parametrize("builder", ["lbvh", "sah"])
def test_interior_nodes_contain_children(builder):
    rng = np.random.default_rng(2)
    tris = jnp.asarray(random_tris(rng, 64))
    bvh = (
        lbvh.build_lbvh(tris) if builder == "lbvh" else sah.build_sah(tris)
    )
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    c0 = np.asarray(bvh.child0)
    c1 = np.asarray(bvh.child1)
    for i in range(bvh.num_nodes):
        if c0[i] < 0:
            continue
        for c in (c0[i], c1[i]):
            if np.all(np.isfinite(lo[c])):
                assert np.all(lo[i] <= lo[c] + 1e-5)
                assert np.all(hi[i] >= hi[c] - 1e-5)


def test_sah_all_triangles_reachable():
    rng = np.random.default_rng(5)
    tris = jnp.asarray(random_tris(rng, 123))
    bvh = sah.build_sah(tris, leaf_size=4)
    ids = np.asarray(bvh.tri_id)
    assert sorted(ids[ids >= 0].tolist()) == list(range(123))
    # every leaf referenced by exactly one node
    c0 = np.asarray(bvh.child0)
    leaves = sorted((-c0[c0 < 0] - 1).tolist())
    assert leaves == list(range(len(leaves)))


@pytest.mark.parametrize("builder", ["lbvh", "sah"])
@pytest.mark.parametrize("n_tris,leaf_size", [(12, 1), (100, 4), (333, 8)])
def test_closest_hit_matches_brute(rng, builder, n_tris, leaf_size):
    tris = jnp.asarray(random_tris(rng, n_tris))
    o, d = random_rays(rng, 256)
    bvh = (
        lbvh.build_lbvh(tris, leaf_size=leaf_size)
        if builder == "lbvh"
        else sah.build_sah(tris, leaf_size=leaf_size)
    )
    res_b = traverse.intersect_closest(bvh, o, d, 1e-4, 1e9)
    res_r = brute.intersect_closest(tris, o, d, 1e-4, 1e9)
    tb, tr = np.asarray(res_b["t"]), np.asarray(res_r["t"])
    ib, ir = np.asarray(res_b["tri"]), np.asarray(res_r["tri"])
    # identical hits (same tri) except float-tie edge cases
    agree = (ib == ir).mean()
    assert agree > 0.99, f"agree={agree}"
    both = (ib >= 0) & (ir >= 0)
    np.testing.assert_allclose(tb[both], tr[both], rtol=1e-4, atol=1e-5)


def test_any_hit_matches_brute(rng):
    tris = jnp.asarray(random_tris(rng, 150))
    o, d = random_rays(rng, 256)
    bvh = lbvh.build_lbvh(tris)
    occ_b = np.asarray(traverse.intersect_any(bvh, o, d, 1e-4, 4.0))
    occ_r = np.asarray(brute.intersect_any(tris, o, d, 1e-4, 4.0))
    assert (occ_b == occ_r).mean() > 0.99


def test_tmax_window(rng):
    tris = jnp.asarray(random_tris(rng, 60))
    o, d = random_rays(rng, 128)
    bvh = lbvh.build_lbvh(tris)
    res_full = traverse.intersect_closest(bvh, o, d, 1e-4, 1e9)
    t_full = np.asarray(res_full["t"])
    hit = np.isfinite(t_full)
    # shrink tmax below each hit -> must miss
    cap = jnp.asarray(np.where(hit, t_full * 0.5, 1e9).astype(np.float32))
    res_cap = traverse.intersect_closest(bvh, o, d, 1e-4, cap)
    assert np.all(np.asarray(res_cap["tri"])[hit] == -1) or (
        np.asarray(res_cap["t"])[hit] < t_full[hit] * 0.5 + 1e-5
    ).all()


def test_cornell_render_bvh_equals_brute():
    """Whole-frame equality: depth AOV identical through either intersector."""
    import functools

    from lumenrenderer_tpu.core.camera import generate_primary_rays

    scene, camf = presets.cornell_box()
    sc, cam = scene.build(), camf(1.0)
    o, d = generate_primary_rays(cam, 48, 48, jnp.uint32(0), jitter="center")
    bvh = lbvh.build_lbvh(sc.tri_pos, leaf_size=4)
    rb = traverse.intersect_closest(bvh, o, d, 1e-3, 1e9)
    rr = brute.intersect_closest(sc.tri_pos, o, d, 1e-3, 1e9)
    assert (np.asarray(rb["tri"]) == np.asarray(rr["tri"])).mean() > 0.995
    both = (np.asarray(rb["tri"]) >= 0) & (np.asarray(rb["tri"]) == np.asarray(rr["tri"]))
    np.testing.assert_allclose(
        np.asarray(rb["t"])[both], np.asarray(rr["t"])[both], rtol=1e-4
    )


def test_single_triangle_and_degenerate():
    tris = jnp.asarray(
        np.array(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]], [[0, 0, 0], [0, 0, 0], [0, 0, 0]]],
            np.float32,
        )
    )
    bvh = lbvh.build_lbvh(tris, leaf_size=2)
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    res = traverse.intersect_closest(bvh, o, d, 1e-4, 1e9)
    assert int(res["tri"][0]) == 0
    np.testing.assert_allclose(float(res["t"][0]), 1.0, atol=1e-5)
