import time
import jax, jax.numpy as jnp
from lumenrenderer_tpu.integrator.wavefront import RenderConfig
from lumenrenderer_tpu.render.renderer import Renderer
from lumenrenderer_tpu.scene import presets

for (w,h,boxes) in ((320,180,100),(640,360,100),(1280,720,100),(1280,720,600)):
    scene, camf = presets.interior_scene(n_boxes=boxes, n_lights=64)
    sc, cam = scene.build(), camf(w/h)
    cfg = RenderConfig(width=w, height=h, max_depth=5, bsdf="disney", light_strategy="mis")
    r = Renderer(sc, cfg, accel="tiled")
    st = r.init_state(0)
    st,_ = r.render_frame(st, cam)
    t0=time.perf_counter()
    for _ in range(3): st,_ = r.render_frame(st, cam)
    jax.block_until_ready(st.accum)
    dt=(time.perf_counter()-t0)/3
    print(f"{w}x{h} {sc.num_triangles}tris: {dt*1e3:.1f} ms/frame ({w*h/dt/1e6:.2f} Mpath/s)", flush=True)
