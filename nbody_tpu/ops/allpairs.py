"""Tiled all-pairs gravity kernel (Pallas, TPU).

TPU-native redesign of the reference's O(N^2) engines: the CPU triple loop
(main_approach_1.cpp:53-75) and the thread-per-body CUDA mapping
(project.cu:703).  Instead of one body per thread, bodies are processed as
(target-block x source-block) interaction tiles resident in VMEM:

* displacement / inverse-cube weights on the VPU (8x128 lanes),
* the force reduction as a lane reduction of w*(p_s - p_t) per target row.
  (A matmul formulation ``(W @ x_s) - x_t * (W @ 1)`` would ride the MXU
  but cancels catastrophically — W is dominated by nearest neighbours
  where x_s ~= x_t — so the reduction stays on the VPU, matching the
  reference's per-pair ``factor * displacement`` numerics.)

The reference's shared-memory staging of the tree (project.cu:691-700) and
its occupancy model (project.cu:163-217) map to the BlockSpec tiling below:
source/target tiles are pinned to VMEM and block sizes are the tuning knob
(SimConfig.target_block / source_block).

Semantics vs reference:
* softening == 0.0 -> main_approach_1.cpp factoring G*m_j/d^3 * disp.
* softening == eps -> Barnes-Hut leaf-pair factoring with the softened
  distance: G*m_j / (d2 * (sqrt(d2)+eps)) * disp (project.cu:651-658).
* Self-interaction is excluded exactly by the d2 > 0 guard (a body has zero
  displacement from itself).  Deviation: the reference naive engine emits
  inf/NaN for *distinct* coincident bodies (no softening, 1/d^2 at d=0,
  main_approach_1.cpp:66-67); we define that force as 0 instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sentinel position for padded bodies: far enough that 1/d^3 underflows to
# zero against any real body, small enough that d^2 stays finite in f32.
_PAD_SENTINEL = 1e15

# Rows of the packed source matrix (8 sublanes; rows 3..7 zero padding).
_SRC_X, _SRC_Y, _SRC_GM = 0, 1, 2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _allpairs_kernel(
    tgt_ref,  # (TB, 8) f32: cols [x, y, 0...]
    src_ref,  # (8, SB) f32: rows [x, y, g*m, 1, 0...]
    out_ref,  # (TB, 8) f32: cols [acc_x, acc_y, 0...]
    acc_ref,  # VMEM scratch (TB, 8) f32: cols 0/1 = sums, 4/5 = Kahan comp
    *,
    softening: float,
    n_src_tiles: int,
    compensated: bool = False,
):
    s = pl.program_id(1)

    tx = tgt_ref[:, _SRC_X : _SRC_X + 1]  # (TB, 1)
    ty = tgt_ref[:, _SRC_Y : _SRC_Y + 1]
    sx = src_ref[_SRC_X : _SRC_X + 1, :]  # (1, SB)
    sy = src_ref[_SRC_Y : _SRC_Y + 1, :]
    gm = src_ref[_SRC_GM : _SRC_GM + 1, :]

    # Pairwise displacements on the VPU.  Computed by direct subtraction
    # (not the |a|^2+|b|^2-2ab matmul identity) to avoid catastrophic
    # cancellation for close pairs.
    dx = sx - tx  # (TB, SB)
    dy = sy - ty
    d2 = dx * dx + dy * dy
    valid = d2 > 0.0  # kills self-pairs exactly and coincident pads
    inv_d = jax.lax.rsqrt(d2)
    if softening:
        # Barnes-Hut factoring: G*m / (d2 * (d + eps))
        d = d2 * inv_d
        w = gm / (d2 * (d + softening))
    else:
        # Naive factoring: G*m / d^3
        w = gm * (inv_d * inv_d * inv_d)
    w = jnp.where(valid, w, 0.0)

    # Per-target-row lane reduction of w * displacement (no cancellation:
    # each pair contributes w*dx directly, like the reference's
    # ``sum += factor * displacement``, main_approach_1.cpp:69-71).
    if compensated and w.shape[1] > 128:
        # chunked Kahan within the tile: 128-lane tree sums chained with
        # compensation, bounding the within-tile accumulation error at
        # ~2 eps independent of SB
        def _chunk_kahan(prod):
            s_run = jnp.zeros_like(prod[:, 0:1])
            c_run = jnp.zeros_like(s_run)
            for i in range(prod.shape[1] // 128):
                v = jnp.sum(
                    prod[:, i * 128 : (i + 1) * 128], axis=1, keepdims=True
                )
                y = v - c_run
                t = s_run + y
                c_run = (t - s_run) - y
                s_run = t
            return s_run - c_run

        acc_x = _chunk_kahan(w * dx)
        acc_y = _chunk_kahan(w * dy)
    else:
        acc_x = jnp.sum(w * dx, axis=1, keepdims=True)  # (TB, 1)
        acc_y = jnp.sum(w * dy, axis=1, keepdims=True)

    @pl.when(s == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        acc_ref[:, _SRC_X : _SRC_X + 1] = acc_x
        acc_ref[:, _SRC_Y : _SRC_Y + 1] = acc_y

    @pl.when(s != 0)
    def _acc():
        if compensated:
            # Kahan-compensated cross-tile accumulation (SURVEY 7 "hard
            # parts"): the per-tile partial sums form the long sequential
            # chain (N / SB adds), so the running compensation lives in
            # the spare scratch columns 4/5.
            for col, v in ((_SRC_X, acc_x), (_SRC_Y, acc_y)):
                s_prev = acc_ref[:, col : col + 1]
                c = acc_ref[:, col + 4 : col + 5]
                y = v - c
                t = s_prev + y
                acc_ref[:, col + 4 : col + 5] = (t - s_prev) - y
                acc_ref[:, col : col + 1] = t
        else:
            acc_ref[:, _SRC_X : _SRC_X + 1] = (
                acc_ref[:, _SRC_X : _SRC_X + 1] + acc_x
            )
            acc_ref[:, _SRC_Y : _SRC_Y + 1] = (
                acc_ref[:, _SRC_Y : _SRC_Y + 1] + acc_y
            )

    @pl.when(s == n_src_tiles - 1)
    def _epilogue():
        out_ref[:, :] = acc_ref[:, :]
        if compensated:
            # fold the residual compensation into the result
            for col in (_SRC_X, _SRC_Y):
                out_ref[:, col : col + 1] = (
                    acc_ref[:, col : col + 1]
                    - acc_ref[:, col + 4 : col + 5]
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "g",
        "softening",
        "target_block",
        "source_block",
        "interpret",
        "compensated",
    ),
)
def allpairs_accelerations_vs(
    target_positions: jax.Array,  # (Nt, 2)
    source_positions: jax.Array,  # (Ns, 2)
    source_masses: jax.Array,  # (Ns,)
    *,
    g: float,
    softening: float = 0.0,
    target_block: int = 256,
    source_block: int = 1024,
    interpret: bool = False,
    compensated: bool = False,
) -> jax.Array:
    """Accelerations of targets due to sources via the tiled kernel.

    Targets and sources may be different clouds — the multi-chip DP / ring
    modes pass the local body block as targets and (a rotating slice of)
    the gathered global cloud as sources.  A target that also appears among
    the sources at bit-identical coordinates is self-excluded by the
    ``d2 > 0`` guard, so no index bookkeeping crosses device boundaries.
    Returns (Nt, 2).
    """
    nt = target_positions.shape[0]
    ns = source_positions.shape[0]
    target_positions = target_positions.astype(jnp.float32)
    source_positions = source_positions.astype(jnp.float32)
    source_masses = source_masses.astype(jnp.float32)

    nt_pad = _round_up(max(nt, target_block), target_block)
    ns_pad = _round_up(max(ns, source_block), source_block)

    # Packed target matrix (Nt_pad, 8): [x, y, 0, ...].
    tgt = jnp.zeros((nt_pad, 8), dtype=jnp.float32)
    tgt = tgt.at[:nt, 0:2].set(target_positions)
    tgt = tgt.at[nt:, 0:2].set(_PAD_SENTINEL)

    # Packed source matrix (8, Ns_pad): [x, y, g*m, 0...]; padded bodies
    # get the far sentinel position and zero mass: they contribute nothing.
    src = jnp.zeros((8, ns_pad), dtype=jnp.float32)
    src = src.at[0:2, :ns].set(source_positions.T)
    src = src.at[0:2, ns:].set(_PAD_SENTINEL)
    src = src.at[2, :ns].set(jnp.asarray(g, jnp.float32) * source_masses)

    n_tgt_tiles = nt_pad // target_block
    n_src_tiles = ns_pad // source_block

    kernel = functools.partial(
        _allpairs_kernel,
        softening=float(softening),
        n_src_tiles=n_src_tiles,
        compensated=compensated,
    )

    pairs = nt_pad * ns_pad
    out = pl.pallas_call(
        kernel,
        grid=(n_tgt_tiles, n_src_tiles),
        in_specs=[
            pl.BlockSpec(
                (target_block, 8),
                lambda t, s: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, source_block),
                lambda t, s: (0, s),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (target_block, 8), lambda t, s: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt_pad, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((target_block, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * pairs,
            bytes_accessed=(nt_pad * 8 * 4) * 2 + (8 * ns_pad * 4),
            transcendentals=pairs,
        ),
        interpret=interpret,
    )(tgt, src)

    return out[:nt, 0:2]


def allpairs_accelerations(
    positions: jax.Array,  # (N, 2)
    masses: jax.Array,  # (N,)
    *,
    g: float,
    softening: float = 0.0,
    target_block: int = 256,
    source_block: int = 1024,
    interpret: bool = False,
    compensated: bool = False,
) -> jax.Array:
    """Single-cloud O(N^2) accelerations (targets == sources)."""
    return allpairs_accelerations_vs(
        positions,
        positions,
        masses,
        g=g,
        softening=softening,
        target_block=target_block,
        source_block=source_block,
        interpret=interpret,
        compensated=compensated,
    )


def allpairs_accelerations_reference(
    positions: jax.Array,
    masses: jax.Array,
    *,
    g: float,
    softening: float = 0.0,
) -> jax.Array:
    """Dense XLA fallback (small N / non-TPU backends); same semantics."""
    from ..physics import pair_accelerations_dense

    return pair_accelerations_dense(
        positions, masses, g=g, softening=softening
    )
