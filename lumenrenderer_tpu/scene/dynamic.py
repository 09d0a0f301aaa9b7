"""Dynamic scene path: instance-transform edits without host rebuild or
recompile (round 4, VERDICT #7).

TPU-native equivalent of the reference's dirty-transform pipeline:
`Transform` setters notify dependents (`ModelLoading/Transform.h:118-126`)
→ `PTMeshInstance::DependencyCallback` marks the scene
(`PTMeshInstance.cpp:36-40`) → next frame `PTScene` re-writes the instance
records and rebuilds the top-level IAS
(`PTScene.cpp:77-160`, `PTMeshInstance.cpp:119-180`).

Here the same flow is: `Transform` dependents mark instances dirty → the
next frame runs ONE jitted `rebake` that re-transforms the object-space
triangle SoA on device (gathered per-instance matrices), refits the light
geometry (`lights.refit_lights`) and the cluster set
(`stream.refit_clusters`). All shapes are static, so the renderer's compiled
frame step — which takes the scene and clusters as ARGUMENTS — never
retraces. Refit-vs-rebuild trade is the standard one: cluster membership is
frozen at build, so quality degrades gracefully for large excursions
(rebuild by constructing a new Renderer when instances travel far).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..accel.stream import refit_clusters as _refit_clusters
from ..core.transform import Transform
from .geometry import FlatGeometry, InstanceHost, flatten_instances
from .lights import refit_lights
from .scene import SceneBuilder, SceneData

_jit_refit = jax.jit(_refit_clusters)


def _refit_inst(ics, mats):
    from ..accel.two_level import refit_instances

    return refit_instances(ics, mats)


_jit_refit_inst = jax.jit(_refit_inst)


@jax.jit
def _transform_geometry(obj_pos, obj_normal, obj_tangent, tri_inst, mats4):
    """Apply per-instance 4x4s to the object-space triangle SoA (device)."""
    rot = mats4[:, :3, :3]                         # (I,3,3)
    trn = mats4[:, :3, 3]                          # (I,3)
    # normals use the inverse-transpose (correct under non-uniform scale)
    rot_it = jnp.linalg.inv(rot).transpose(0, 2, 1)
    r_t = rot[tri_inst]                            # (T,3,3)
    t_t = trn[tri_inst]                            # (T,3)
    rit_t = rot_it[tri_inst]
    # HIGHEST: default TPU matmul is one bf16 pass — rebaked vertex
    # positions would be 2^-8-rounded (geometry cracks)
    hp = jax.lax.Precision.HIGHEST
    pos = jnp.einsum("tij,tvj->tvi", r_t, obj_pos, precision=hp) + t_t[:, None, :]
    nrm = jnp.einsum("tij,tvj->tvi", rit_t, obj_normal, precision=hp)
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    tan_xyz = jnp.einsum("tij,tvj->tvi", r_t, obj_tangent[..., :3], precision=hp)
    tan = jnp.concatenate([tan_xyz, obj_tangent[..., 3:4]], axis=-1)
    return pos, nrm, tan


class DynamicScene:
    """Owns object-space geometry + per-instance `Transform`s and produces
    refreshed (SceneData, ClusterSet) pairs on demand.

    Usage:
        dyn = DynamicScene(builder)
        scene = dyn.build()                       # initial SceneData
        r = Renderer(scene, cfg, dynamic=dyn)     # threads scene+clusters
        dyn.transform(3).translation = (1, 0, 0)  # marks dirty via dependents
        r.render_frame(...)                       # rebakes, NO recompile
    """

    def __init__(self, builder: SceneBuilder):
        self._builder = builder
        # flatten with IDENTITY transforms -> object-space SoA; instance
        # initial transforms seed the Transform nodes
        obj_insts = [
            dataclasses.replace(i, transform=np.eye(4, dtype=np.float32))
            for i in builder.instances
        ]
        self._obj: FlatGeometry = flatten_instances(obj_insts)
        self._transforms: List[Transform] = []
        self._init_mats = [
            np.asarray(i.transform, np.float32) for i in builder.instances
        ]
        self.dirty = True
        for i, _ in enumerate(builder.instances):
            tr = Transform()
            tr.add_dependent(self._mark_dirty)
            self._transforms.append(tr)
        self._scene0: Optional[SceneData] = None

    # -- transform access (≙ ILumenScene instance transforms) -------------
    def transform(self, instance_id: int) -> Transform:
        return self._transforms[instance_id]

    def _mark_dirty(self):
        self.dirty = True

    def world_matrices(self) -> np.ndarray:
        """(I,4,4): initial instance transform composed with the Transform
        node's world matrix (node defaults to identity)."""
        out = np.stack([
            t.world_matrix @ m0
            for t, m0 in zip(self._transforms, self._init_mats)
        ]) if self._transforms else np.zeros((0, 4, 4), np.float32)
        return out.astype(np.float32)

    # -- device builds ------------------------------------------------------
    def build(self) -> SceneData:
        """Initial SceneData (host build, as SceneBuilder.build would)."""
        if self._scene0 is None:
            self._scene0 = self._builder.build()
        return self._scene0

    def rebake(self, scene: SceneData, clusters=None):
        """Refresh (scene, clusters) from the current transforms — one jitted
        device pass, no shape changes, no retrace."""
        mats4 = jnp.asarray(self.world_matrices())
        pos, nrm, tan = _transform_geometry(
            jnp.asarray(self._obj.tri_pos),
            jnp.asarray(self._obj.tri_normal),
            jnp.asarray(self._obj.tri_tangent),
            jnp.asarray(self._obj.tri_inst),
            mats4,
        )
        new_scene = scene.replace(
            tri_pos=pos, tri_normal=nrm, tri_tangent=tan,
            lights=refit_lights(scene.lights, pos),
        )
        self.dirty = False
        if clusters is None:
            return new_scene, None
        # jitted ONCE (module-level wrapper): re-wrapping jax.jit per rebake
        # would re-hash/retrace every edit (ADVICE r4 low)
        return new_scene, _jit_refit(clusters, pos)

    def rebake_two_level(self, scene: SceneData, ics):
        """Two-level variant (round 5): shading attributes rebake O(T) as
        above, but the ACCEL refit is `two_level.refit_instances` — O(units),
        no triangle re-transform (≙ the reference rebuilding only the IAS on
        transform dirt, PTScene.cpp:77-160)."""
        new_scene, _ = self.rebake(scene, None)
        return new_scene, _jit_refit_inst(ics, jnp.asarray(self.world_matrices()))
