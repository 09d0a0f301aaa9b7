"""Denoiser, upscaler, checkpoint/resume tests."""
import numpy as np
import jax
import jax.numpy as jnp

from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render import checkpoint, denoise, upscale
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets


def test_atrous_reduces_noise_preserves_edges():
    rng = np.random.default_rng(0)
    h = w = 64
    # two flat regions with an albedo+normal edge, plus noise
    clean = np.zeros((h, w, 3), np.float32)
    clean[:, : w // 2] = 0.8
    clean[:, w // 2 :] = 0.2
    noisy = clean + rng.normal(0, 0.2, clean.shape).astype(np.float32)
    albedo = np.ones_like(clean)
    normal = np.zeros_like(clean)
    normal[:, : w // 2, 2] = 1.0
    normal[:, w // 2 :, 0] = 1.0
    depth = np.ones((h, w), np.float32)
    out = np.asarray(
        denoise.atrous_denoise(
            jnp.asarray(noisy), jnp.asarray(albedo), jnp.asarray(normal),
            jnp.asarray(depth), iterations=4,
        )
    )
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < err_in * 0.5
    # edge preserved: means of the two halves stay distinct
    assert out[:, : w // 2 - 2].mean() > 0.6
    assert out[:, w // 2 + 2 :].mean() < 0.4


def test_denoise_frame_on_render():
    builder, camf = presets.cornell_box()
    sc, cam = builder.build(), camf(1.0)
    r = Renderer(sc, RenderConfig(width=32, height=32, max_depth=3, bsdf="lambert"),
                 accel="stream", cluster_size=8, donate=False)
    st = r.init_state(0)
    st, aux = r.render_frame(st, cam)
    out = denoise.denoise_frame(st.accum, aux, 32, 32)
    a = np.asarray(out)
    assert a.shape == (32 * 32, 3)
    assert np.isfinite(a).all()


def test_upscale_shapes_and_range():
    img = jnp.asarray(np.random.default_rng(1).random((24, 32, 3)).astype(np.float32))
    up = upscale.upscale(img, 48, 64, method="lanczos3", sharpen=0.3)
    assert up.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(up)).all()
    assert float(up.min()) >= 0.0


def test_checkpoint_resume_exact(tmp_path):
    builder, camf = presets.cornell_box()
    sc, cam = builder.build(), camf(1.0)
    cfg = RenderConfig(width=16, height=16, max_depth=2, bsdf="lambert")
    r = Renderer(sc, cfg, accel="stream", cluster_size=8, donate=False)
    st = r.init_state(3)
    for _ in range(2):
        st, _ = r.render_frame(st, cam)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(p, st)

    # resume into a fresh state and continue; compare against uninterrupted
    st_resumed = checkpoint.load_state(p, r.init_state(999))
    np.testing.assert_allclose(np.asarray(st.accum), np.asarray(st_resumed.accum))
    assert int(st_resumed.frame_index) == 2
    st_a, _ = r.render_frame(st, cam)
    st_b, _ = r.render_frame(st_resumed, cam)
    np.testing.assert_allclose(
        np.asarray(st_a.accum), np.asarray(st_b.accum), atol=1e-6
    )
