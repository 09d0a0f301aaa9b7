"""Multi-host entry point (round 4, VERDICT #8).

The reference has no distributed backend at all (single CUcontext,
SURVEY §2.7); the TPU-native design scales over a `jax.sharding.Mesh` whose
devices may span hosts. This module is the process bootstrap: on a pod
slice, every host runs the same program and calls `initialize()` before
touching jax.devices(); JAX wires the DCN coordinator from the TPU
environment automatically (explicit args for CPU/GPU fleets or tests).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up jax.distributed for multi-host meshes.

    - On TPU pods: zero-arg call; JAX autodetects the coordinator from the
      TPU metadata. Every host must call this before any device op.
    - Elsewhere (tests, CPU fleets): pass coordinator/num_processes/id or
      set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    - Safe no-op (returns False) when single-process or already initialized.
    """
    global _initialized
    if _initialized:
        return False
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None)
    # Pod detection from environment variables ONLY (ADVICE r4 high):
    # touching any backend-initializing JAX API (jax.default_backend(),
    # jax.devices(), ...) before jax.distributed.initialize() makes JAX
    # 0.9 raise "must be called before any backend is initialized", so a
    # backend probe here would break every real multi-host bootstrap.
    on_tpu_pod = (
        int(os.environ.get("TPU_WORKER_COUNT", "1")) > 1
        or bool(os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def process_info() -> dict:
    """Host/topology summary for logs (≙ the reference's device printout)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
