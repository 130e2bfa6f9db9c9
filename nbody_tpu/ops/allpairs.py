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



def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _allpairs_kernel(
    tgt_ref,  # (TB, 8) f32: cols [x, y, (z,) 0...]
    src_ref,  # (8, SB) f32: rows [x, y, (z,) g*m, 0...]
    out_ref,  # (TB, 8) f32: cols [acc per axis, 0...]
    acc_ref,  # VMEM scratch (TB, 8) f32: cols 0..D-1 = sums, 4..4+D-1 =
    #           Kahan compensation
    *,
    softening: float,
    n_src_tiles: int,
    compensated: bool = False,
    dims: int = 2,
):
    s = pl.program_id(1)

    # Pairwise displacements on the VPU.  Computed by direct subtraction
    # (not the |a|^2+|b|^2-2ab matmul identity) to avoid catastrophic
    # cancellation for close pairs.  Coordinate rows/cols 0..dims-1,
    # g*m at index ``dims`` (2D: [x, y, gm], 3D: [x, y, z, gm]).
    d2 = None
    disp = []
    for ax in range(dims):
        da = src_ref[ax : ax + 1, :] - tgt_ref[:, ax : ax + 1]  # (TB, SB)
        disp.append(da)
        d2 = da * da if d2 is None else d2 + da * da
    gm = src_ref[dims : dims + 1, :]

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

        accs = [_chunk_kahan(w * da) for da in disp]
    else:
        accs = [jnp.sum(w * da, axis=1, keepdims=True) for da in disp]

    @pl.when(s == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        for col, v in enumerate(accs):
            acc_ref[:, col : col + 1] = v

    @pl.when(s != 0)
    def _acc():
        if compensated:
            # Kahan-compensated cross-tile accumulation (SURVEY 7 "hard
            # parts"): the per-tile partial sums form the long sequential
            # chain (N / SB adds), so the running compensation lives in
            # the spare scratch columns 4..6.
            for col, v in enumerate(accs):
                s_prev = acc_ref[:, col : col + 1]
                c = acc_ref[:, col + 4 : col + 5]
                y = v - c
                t = s_prev + y
                acc_ref[:, col + 4 : col + 5] = (t - s_prev) - y
                acc_ref[:, col : col + 1] = t
        else:
            for col, v in enumerate(accs):
                acc_ref[:, col : col + 1] = acc_ref[:, col : col + 1] + v

    @pl.when(s == n_src_tiles - 1)
    def _epilogue():
        out_ref[:, :] = acc_ref[:, :]
        if compensated:
            # fold the residual compensation into the result
            for col in range(dims):
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
    target_positions: jax.Array,  # (Nt, D), D = 2 or 3
    source_positions: jax.Array,  # (Ns, D)
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
    Returns (Nt, D).
    """
    if not interpret and any(
        a.dtype == jnp.float64
        for a in (target_positions, source_positions, source_masses)
    ):
        # Mirror list_eval_pallas's stance: never silently downcast a
        # float64 request to f32 physics (the reference is all-f64,
        # project.cu:38-43).  models.engines routes float64 configs to
        # the chunked dense XLA path instead of reaching this kernel.
        raise ValueError(
            "allpairs Pallas kernel is f32-only (TPU Mosaic has no f64 "
            "lowering); for float64 use physics.pair_accelerations_"
            "chunked (the engine route for dtype='float64'), the NumPy "
            "f64 oracle (nbody_tpu.models.oracle), or the native C++ "
            "engine"
        )
    nt, dims = target_positions.shape
    ns = source_positions.shape[0]
    target_positions = target_positions.astype(jnp.float32)
    source_positions = source_positions.astype(jnp.float32)
    source_masses = source_masses.astype(jnp.float32)

    nt_pad = _round_up(max(nt, target_block), target_block)
    ns_pad = _round_up(max(ns, source_block), source_block)

    # Packed target matrix (Nt_pad, 8): [x, y, (z,) 0, ...].
    tgt = jnp.zeros((nt_pad, 8), dtype=jnp.float32)
    tgt = tgt.at[:nt, 0:dims].set(target_positions)
    tgt = tgt.at[nt:, 0:dims].set(_PAD_SENTINEL)

    # Packed source matrix (8, Ns_pad): [x, y, (z,) g*m, 0...]; padded
    # bodies get the far sentinel position and zero mass: they contribute
    # nothing.
    src = jnp.zeros((8, ns_pad), dtype=jnp.float32)
    src = src.at[0:dims, :ns].set(source_positions.T)
    src = src.at[0:dims, ns:].set(_PAD_SENTINEL)
    src = src.at[dims, :ns].set(
        jnp.asarray(g, jnp.float32) * source_masses
    )

    n_tgt_tiles = nt_pad // target_block
    n_src_tiles = ns_pad // source_block

    kernel = functools.partial(
        _allpairs_kernel,
        softening=float(softening),
        n_src_tiles=n_src_tiles,
        compensated=compensated,
        dims=dims,
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

    return out[:nt, 0:dims]


def allpairs_accelerations(
    positions: jax.Array,  # (N, D)
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


def _potential_kernel(
    tgt_ref,  # (TB, 8) f32: cols [x, y, (z,) 0...]
    src_ref,  # (8, SB) f32: rows [x, y, (z,) g*m, 0...]
    out_ref,  # (TB, 8) f32: col 0 = per-body potential
    acc_ref,  # VMEM scratch (TB, 8)
    *,
    n_src_tiles: int,
    dims: int = 2,
):
    s = pl.program_id(1)
    d2 = None
    for ax in range(dims):
        da = src_ref[ax : ax + 1, :] - tgt_ref[:, ax : ax + 1]
        d2 = da * da if d2 is None else d2 + da * da
    gm = src_ref[dims : dims + 1, :]
    valid = (d2 > 0.0) & (gm > 0.0)
    inv_d = jax.lax.rsqrt(d2)
    # phi contribution: -g*m_j / d  (unsoftened, matching the dense
    # potential_energy diagnostic)
    phi = jnp.where(valid, -gm * inv_d, 0.0)
    v = jnp.sum(phi, axis=1, keepdims=True)

    @pl.when(s == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)
        acc_ref[:, 0:1] = v

    @pl.when(s != 0)
    def _acc():
        acc_ref[:, 0:1] = acc_ref[:, 0:1] + v

    @pl.when(s == n_src_tiles - 1)
    def _write():
        out_ref[:, :] = acc_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("g", "target_block", "source_block", "interpret"),
)
def allpairs_potential(
    positions: jax.Array,  # (N, D)
    masses: jax.Array,  # (N,)
    *,
    g: float,
    target_block: int = 512,
    source_block: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Per-body gravitational potential phi_i = sum_j -g*m_j/d_ij via the
    tiled kernel (PE = 0.5 * sum_i m_i * phi_i).

    The O(N^2) reduction that makes ``total_energy`` finite at flagship
    scales (round-2 verdict item 6) — the dense [N, N] diagnostic
    (physics.potential_energy) stops being representable long before
    N=64K.  Same tiling/VMEM discipline as the force kernel.
    """
    if not interpret and positions.dtype == jnp.float64:
        raise ValueError(
            "allpairs_potential is f32-only on TPU; use "
            "physics.potential_energy_scalable (it routes f64 to the "
            "chunked dense path)"
        )
    n, dims = positions.shape
    positions = positions.astype(jnp.float32)
    masses = masses.astype(jnp.float32)
    n_pad_t = _round_up(max(n, target_block), target_block)
    n_pad_s = _round_up(max(n, source_block), source_block)

    tgt = jnp.zeros((n_pad_t, 8), dtype=jnp.float32)
    tgt = tgt.at[:n, 0:dims].set(positions)
    tgt = tgt.at[n:, 0:dims].set(_PAD_SENTINEL)
    src = jnp.zeros((8, n_pad_s), dtype=jnp.float32)
    src = src.at[0:dims, :n].set(positions.T)
    src = src.at[0:dims, n:].set(_PAD_SENTINEL)
    src = src.at[dims, :n].set(jnp.asarray(g, jnp.float32) * masses)

    n_tgt_tiles = n_pad_t // target_block
    n_src_tiles = n_pad_s // source_block
    out = pl.pallas_call(
        functools.partial(
            _potential_kernel, n_src_tiles=n_src_tiles, dims=dims
        ),
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
        out_shape=jax.ShapeDtypeStruct((n_pad_t, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((target_block, 8), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_pad_t * n_pad_s,
            bytes_accessed=(n_pad_t * 8 * 2 + 8 * n_pad_s) * 4,
            transcendentals=n_pad_t * n_pad_s,
        ),
        interpret=interpret,
    )(tgt, src)
    return out[:n, 0]


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
