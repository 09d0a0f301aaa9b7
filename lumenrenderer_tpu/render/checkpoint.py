"""Checkpoint/resume for long renders and training runs.

The reference has no checkpointing (SURVEY §5.3-5.4 — closest feature is the
in-memory blend accumulator). Here the whole renderer state — accumulation
buffer, blend counter, frame index, RNG key, ReSTIR reservoirs — is one
pytree (`render/state.py`), so resume is exact: save/restore every leaf.
Orbax is used when available; a dependency-free npz path always works.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state: Any) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )


def load_state(path: str, like: Any) -> Any:
    """Restore into the structure of `like` (a freshly-initialized state)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        new = [
            jnp.asarray(z[f"leaf_{i}"]).astype(l.dtype).reshape(l.shape)
            for i, l in enumerate(leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new)


def save_orbax(path: str, state: Any) -> bool:
    """Orbax checkpoint (multi-host-safe); returns False if orbax missing."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    return True


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=like)
