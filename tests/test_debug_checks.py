"""RenderConfig.debug_checks: the production NaN/Inf guard names the first
offending stage (VERDICT r4 #9; ≙ CudaUtilities.h:6-106 CHECK macros +
device NaN asserts in ReSTIRKernels.cu:879-899)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumenrenderer_tpu.integrator.wavefront import RenderConfig, decode_debug_stage
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets


def _renderer(sc, debug=True):
    cfg = RenderConfig(width=16, height=16, max_depth=3, bsdf="lambert",
                       light_strategy="mis", rr_start_depth=99,
                       debug_checks=debug)
    return Renderer(sc, cfg, accel="sah")


def test_clean_scene_passes():
    scene, camf = presets.cornell_box(with_blocks=True)
    sc, cam = scene.build(), camf(1.0)
    r = _renderer(sc)
    st = r.init_state(0)
    st, aux = r.render_frame(st, cam)  # must not raise
    assert int(aux["debug_first_bad"]) == 0


def test_nan_material_names_stage():
    scene, camf = presets.cornell_box(with_blocks=True)
    sc, cam = scene.build(), camf(1.0)
    bc = sc.materials.base_color
    sc_bad = sc.replace(materials=sc.materials.replace(
        base_color=bc.at[0, 0].set(jnp.nan)))
    r = _renderer(sc_bad)
    st = r.init_state(0)
    with pytest.raises(RuntimeError, match="extract_surface_data"):
        r.render_frame(st, cam)


def test_guard_off_by_default_is_silent():
    scene, camf = presets.cornell_box(with_blocks=True)
    sc, cam = scene.build(), camf(1.0)
    bc = sc.materials.base_color
    sc_bad = sc.replace(materials=sc.materials.replace(
        base_color=bc.at[0, 0].set(jnp.nan)))
    r = _renderer(sc_bad, debug=False)
    st = r.init_state(0)
    st, aux = r.render_frame(st, cam)  # silently propagates (old behavior)
    assert "debug_first_bad" not in aux


def test_decode_debug_stage():
    assert decode_debug_stage(0) is None
    assert decode_debug_stage(2) == "extract_surface_data (depth 0)"
