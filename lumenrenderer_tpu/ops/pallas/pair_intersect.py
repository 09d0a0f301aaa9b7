"""Pallas TPU kernel: pair-tile × cluster intersection (round 5).

The round-4 visit kernel (`ops/pallas/intersect.py`) processes 128-RAY tiles
against the UNION of clusters any ray in the tile needs — measured waste of
~100-250× (sorted bounce tiles admit ~21 clusters ≈ 2,700 triangle tests per
ray vs ~10 exact; docs/PERF.md admission table). This kernel inverts the
layout, per VERDICT r4 #1: admission is refined per RAY (exact cluster-level
slab test, `accel/pairs.py`), the surviving (ray, cluster) pairs are sorted
cluster-major and padded so every 128-pair tile references exactly ONE
cluster, and each tile is ONE Möller–Trumbore bilinear-form matmul
(128 pairs on sublanes × 4K candidate columns on lanes) with the hit decode
fused in VMEM. Zero wasted lanes, no visit loop, no early-out machinery —
rays only ever meet clusters they individually admit.

≙ reference traversal `OptixWrapper.cpp:543-567` + per-ray BVH walk in
`Shaders/WaveFrontShaders.cu:42-112`; this is its TPU-native shape: RT-core
per-ray traversal becomes sort/segment stream work feeding the MXU.

Outputs per pair: packed winner key (closest; t bits high, intra-cluster
triangle id low — shared layout with accel/tiled.py) or occlusion bit (any).
Per-ray reduction happens OUTSIDE the kernel (scatter into per-ray visit
slots + lane min), see accel/pairs.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import FR, KEY_MISS, RT, _make_compute

G = 8          # pair tiles per program (amortizes per-program overhead and
               # makes the (G, 128) int32 output a natural TPU tile)
NBUF = 6       # streaming variant: feature DMA ring depth (rows 1..G-1)


def _make_pair_kernel_resident(k: int, k_bits: int, closest: bool,
                               precision: str):
    """Whole cluster feature table resident in VMEM (constant-index
    BlockSpec); each program handles G pair tiles = G dynamic VMEM slices +
    G matmuls. Scenes whose feature table exceeds RESIDENT_BYTES take the
    streaming kernel below."""

    def kernel(tc_ref, rf_ref, feats_ref, out_ref):
        g = pl.program_id(0)
        for row in range(G):
            rf = rf_ref[0, row]                 # (128, 12)
            rfm = rf[:, :10]
            tmin = rf[:, 10:11]
            tmax = rf[:, 11:12]
            feats = feats_ref[tc_ref[g * G + row]]   # (FR, 4K) VMEM slice
            kid = jax.lax.broadcasted_iota(jnp.int32, (RT, k), 1)
            compute = _make_compute(k, k_bits, k_bits, closest, precision,
                                    tmin, tmax, kid)
            if closest:
                acc0 = jnp.full((RT, k), KEY_MISS, jnp.int32)
                acc = compute(acc0, feats, rfm, 0)
                fin = jnp.min(acc, axis=1, keepdims=True)   # (128, 1)
            else:
                acc0 = jnp.zeros((RT, k), jnp.int32)
                acc = compute(acc0, feats, rfm, 0)
                fin = jnp.max(acc, axis=1, keepdims=True)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


def _make_pair_kernel_stream(k: int, k_bits: int, closest: bool,
                             precision: str):
    """Streaming variant for feature tables too large for VMEM (mega
    scenes): row 0's features arrive via a scalar-prefetch BlockSpec (Pallas
    pipelines it across programs, hiding the cold-start latency); rows
    1..G-1 stream through an NBUF-slot DMA ring started in a deep prologue
    (same scheme as the r4 visit kernel — HBM latency >> per-row compute)."""

    def kernel(tc_ref, rf_ref, first_ref, feats_hbm, out_ref, fbuf, sems):
        g = pl.program_id(0)

        def dma(row):
            # row >= 1 lives in slot (row-1) % NBUF
            slot = (row - 1) % NBUF
            return pltpu.make_async_copy(
                feats_hbm.at[tc_ref[g * G + row]], fbuf.at[slot],
                sems.at[slot],
            )

        # prologue: keep NBUF-1 fetches in flight (row 0 is pipelined by its
        # BlockSpec; starting NBUF would wrap a write onto a slot still
        # pending its read — see ops/pallas/intersect.py prologue note)
        for j in range(1, min(NBUF, G)):
            dma(j).start()

        for row in range(G):
            rf = rf_ref[0, row]
            rfm = rf[:, :10]
            tmin = rf[:, 10:11]
            tmax = rf[:, 11:12]
            if row == 0:
                feats = first_ref[0]
            else:
                dma(row).wait()
                feats = fbuf[(row - 1) % NBUF]
            if row + NBUF - 1 < G:
                dma(row + NBUF - 1).start()
            kid = jax.lax.broadcasted_iota(jnp.int32, (RT, k), 1)
            compute = _make_compute(k, k_bits, k_bits, closest, precision,
                                    tmin, tmax, kid)
            if closest:
                acc0 = jnp.full((RT, k), KEY_MISS, jnp.int32)
                acc = compute(acc0, feats, rfm, 0)
                fin = jnp.min(acc, axis=1, keepdims=True)
            else:
                acc0 = jnp.zeros((RT, k), jnp.int32)
                acc = compute(acc0, feats, rfm, 0)
                fin = jnp.max(acc, axis=1, keepdims=True)
            out_ref[0, pl.ds(row, 1), :] = fin.astype(jnp.int32).T

    return kernel


RESIDENT_BYTES = 8 * 1024 * 1024


@partial(jax.jit, static_argnames=("k", "k_bits", "closest", "interpret",
                                   "precision", "resident"))
def pair_scan(rf_pairs, feats, tile_cluster, *, k: int, k_bits: int,
              closest: bool, interpret: bool = False,
              precision: str = "highest", resident: bool | str = "auto"):
    """Run the pair-tile kernel.

    rf_pairs:     (S, 12) f32 — per-PAIR ray features (cols 0-9 MT features,
                  col 10 t_min, col 11 t_max; t_max < t_min = padding).
    feats:        (C, 10|16, 4K) f32 cluster MT coefficients.
    tile_cluster: (S/128,) i32 — the single cluster each 128-pair tile
                  references (padding tiles clamp to 0; their pairs are dead).

    Returns (S,) i32: packed winner keys (closest; >= KEY_MISS = miss) or
    occlusion bits (any). S must be a multiple of 128*G. Non-differentiable
    by design (discrete outputs); wrap with stop_gradient at call sites —
    accel/pairs.py guards with the same custom_jvp as visit_scan.
    """
    s = rf_pairs.shape[0]
    assert s % (RT * G) == 0, s
    fk = feats.shape[-1]
    feats16 = jnp.pad(feats, ((0, 0), (0, FR - feats.shape[1]), (0, 0)))
    if resident == "auto":
        resident = feats16.size * 4 <= RESIDENT_BYTES
    tiles = s // RT
    rf_g = rf_pairs.reshape(tiles // G, G, RT, 12)
    tc = tile_cluster.astype(jnp.int32)
    if resident:
        kernel = _make_pair_kernel_resident(k, k_bits, closest, precision)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tiles // G,),
            in_specs=[
                pl.BlockSpec((1, G, RT, 12), lambda g, tc: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(feats16.shape, lambda g, tc: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, G, RT), lambda g, tc: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tiles // G, G, RT), jnp.int32),
            interpret=interpret,
        )(tc, rf_g, feats16)
        return out.reshape(s)
    kernel = _make_pair_kernel_stream(k, k_bits, closest, precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles // G,),
        in_specs=[
            pl.BlockSpec((1, G, RT, 12), lambda g, tc: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # row 0's cluster block, pipelined across programs
            pl.BlockSpec((1, FR, fk), lambda g, tc: (tc[g * G], 0, 0),
                         memory_space=pltpu.VMEM),
            # full table stays in HBM; rows >= 1 are manual ring DMA
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, G, RT), lambda g, tc: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FR, fk), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles // G, G, RT), jnp.int32),
        interpret=interpret,
    )(tc, rf_g, feats16, feats16)
    return out.reshape(s)
