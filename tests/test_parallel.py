"""M7: multi-device sharding on the 8-device virtual CPU mesh.

Scaling-harness foundations: tile-sharded rendering must be numerically
identical to single-device, and the sharded training step must produce
finite replicated gradients (psum inserted by GSPMD).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lumenrenderer_tpu.accel import stream
from lumenrenderer_tpu.core.camera import generate_primary_rays
from lumenrenderer_tpu.integrator.wavefront import (
    RenderConfig,
    merge_channels,
    render_wavefront,
)
from lumenrenderer_tpu.parallel import shard, train
from lumenrenderer_tpu.scene import presets


@functools.lru_cache(maxsize=None)
def _setup():
    builder, camf = presets.cornell_box(with_blocks=True)
    sc = builder.build()
    cam = camf(1.0)
    cs = stream.build_clusters(sc.tri_pos, cluster_size=16)
    isect, occl = stream.stream_intersectors(cs, max_pairs_per_ray=16)
    cfg = RenderConfig(width=16, height=16, max_depth=3, bsdf="lambert",
                       light_strategy="mis", rr_start_depth=99)
    return sc, cam, cfg, isect, occl


def test_mesh_has_8_devices():
    mesh = shard.make_mesh()
    assert mesh.size == 8


def test_sharded_render_matches_single_device():
    sc, cam, cfg, isect, occl = _setup()
    key = jax.random.PRNGKey(0)

    def frame(scene):
        out = render_wavefront(scene, isect, occl, cam, key, jnp.uint32(0), cfg)
        return merge_channels(out)

    ref = np.asarray(jax.jit(frame)(sc))

    mesh = shard.make_mesh()
    with mesh:
        sc_rep = shard.replicate(sc, mesh)
        img = jax.jit(frame, out_shardings=shard.pixel_sharding(mesh))(sc_rep)
        img = np.asarray(img)
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=1e-5)


def test_sharded_train_step_runs_and_reduces():
    sc, cam, cfg, isect, occl = _setup()
    init_state, train_step = train.make_train_step(
        sc, isect, occl, cam, cfg, optax.sgd(1e-2)
    )
    st = init_state()
    mesh = shard.make_mesh()
    target = jnp.zeros((cfg.num_pixels, 3))
    with mesh:
        st = shard.replicate(st, mesh)
        target_s = jax.device_put(target, shard.pixel_sharding(mesh))
        step = jax.jit(train_step)
        new_st, loss = step(st, jax.random.PRNGKey(1), jnp.uint32(0), target_s)
    assert np.isfinite(float(loss))
    # params actually moved (gradient was nonzero and replicated)
    moved = np.abs(
        np.asarray(new_st.params["emissive"]) - np.asarray(st.params["emissive"])
    ).max()
    assert moved > 0


def test_train_converges_on_emission():
    """Inverse rendering sanity: recover a brighter light from a target."""
    sc, cam, cfg, isect, occl = _setup()
    params0, _ = train.split_params(sc)
    # target rendered with 2x emission
    sc_target = train.merge_params(sc, {**params0, "emissive": params0["emissive"] * 2.0})

    def frame(scene, key):
        out = render_wavefront(scene, isect, occl, cam, key, jnp.uint32(0), cfg)
        return merge_channels(out)

    target = jax.jit(frame)(sc_target, jax.random.PRNGKey(42))
    init_state, train_step = train.make_train_step(
        sc, isect, occl, cam, cfg, optax.adam(0.5)
    )
    st = init_state()
    step = jax.jit(train_step)
    loss0 = None
    for i in range(60):
        st, loss = step(st, jax.random.PRNGKey(42), jnp.uint32(0), target)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < loss0 * 0.35, (float(loss), loss0)
    em_row = int(np.argmax(np.asarray(params0["emissive"]).max(-1)))
    got = np.asarray(st.params["emissive"])[em_row].mean()
    want = np.asarray(params0["emissive"])[em_row].mean() * 2
    assert got > np.asarray(params0["emissive"])[em_row].mean() * 1.2


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4096, 3)
    assert np.isfinite(np.asarray(out)).all()
