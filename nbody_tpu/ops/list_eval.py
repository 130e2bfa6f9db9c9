"""Pallas kernel: per-group interaction-list evaluation for Barnes-Hut.

The grouped traversal (bh_grouped.py) reduces Barnes-Hut to, per body
group, a dense evaluation of  group bodies x interaction list  — the same
tile shape as the all-pairs kernel (allpairs.py) with a third leading grid
dimension over groups.  Evaluating it in XLA materialises [chunk, S, K]
HBM temporaries; this kernel streams list tiles through VMEM instead:

  grid (G, K/K_TILE): each step loads the group's body block (S, 8) and a
  list tile (8, K_TILE), computes w = gm / (d2 * (d + eps)) on the VPU and
  accumulates sum(w * disp) per body into VMEM scratch; the final k step
  writes the block's accelerations.

List lengths vary per group while K is the static cap; lists are
left-compacted, so a per-(group, tile) occupancy flag (scalar-prefetched)
lets fully-empty tiles skip the pairwise compute — the dominant cost at
typical ~4-8x padding ratios.

Semantics are the Barnes-Hut accepted-node force (project.cu:651-658,
765-771): softened direction, unsoftened magnitude denominator, with the
d2 > 0 guard providing index-free self-exclusion (bit-exact singleton
COMs / raw body positions, see bh_grouped.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    lens_ref,
    tgt_ref,
    src_ref,
    out_ref,
    acc_ref,
    *,
    softening,
    n_k_tiles,
    k_tile,
    section_offset,
    compensated=False,
):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # The list has two left-compacted sections: approx cells in
    # [0, a_n) and direct bodies in [section_offset, section_offset + d_n).
    # A tile only needs compute if it overlaps either occupied span.
    a_n = lens_ref[0, i]
    d_n = lens_ref[1, i]
    start = k * k_tile
    end = start + k_tile
    occupied = (start < a_n) | (
        (end > section_offset) & (start < section_offset + d_n)
    )

    @pl.when(occupied)
    def _compute():
        tx = tgt_ref[0, :, 0:1]  # (S, 1)
        ty = tgt_ref[0, :, 1:2]
        sx = src_ref[0, 0:1, :]  # (1, K_TILE)
        sy = src_ref[0, 1:2, :]
        gm = src_ref[0, 2:3, :]

        dx = sx - tx  # (S, K_TILE)
        dy = sy - ty
        d2 = dx * dx + dy * dy
        valid = (d2 > 0.0) & (gm > 0.0)
        d = jnp.sqrt(d2) + jnp.float32(softening)
        w = jnp.where(valid, gm / (jnp.where(valid, d2, 1.0) * d), 0.0)
        vx = jnp.sum(w * dx, axis=1, keepdims=True)
        vy = jnp.sum(w * dy, axis=1, keepdims=True)
        if compensated:
            # Kahan across k tiles; compensation in scratch cols 4/5
            for col, v in ((0, vx), (1, vy)):
                s_prev = acc_ref[:, col : col + 1]
                c = acc_ref[:, col + 4 : col + 5]
                y = v - c
                t = s_prev + y
                acc_ref[:, col + 4 : col + 5] = (t - s_prev) - y
                acc_ref[:, col : col + 1] = t
        else:
            acc_ref[:, 0:1] = acc_ref[:, 0:1] + vx
            acc_ref[:, 1:2] = acc_ref[:, 1:2] + vy

    @pl.when(k == n_k_tiles - 1)
    def _write():
        out_ref[0, :, :] = acc_ref[:, :]
        if compensated:
            for col in (0, 1):
                out_ref[0, :, col : col + 1] = (
                    acc_ref[:, col : col + 1]
                    - acc_ref[:, col + 4 : col + 5]
                )


@functools.partial(
    jax.jit,
    static_argnames=(
        "softening", "section_offset", "k_tile", "interpret", "compensated",
    ),
)
def list_eval_pallas(
    targets: jax.Array,  # [G, S, 2] group body positions
    sources: jax.Array,  # [G, 8, K] packed rows [x, y, gm, 0...]; gm==0 pad
    lens: jax.Array,  # [2, G] int32 occupied lengths of the two sections
    #                    (row-major [2, G]: SMEM pads the minor dimension,
    #                    so [G, 2] would cost 512B/row = 1MB at G=2048)
    *,
    softening: float,
    section_offset: int,  # start of the second (direct) section in K
    k_tile: int = 2048,
    interpret: bool = False,
    compensated: bool = False,
) -> jax.Array:
    """Accelerations [G, S, 2] of each group's bodies due to its list."""
    g, s, _ = targets.shape
    # VMEM gate (the occupancy-model discipline, utils/occupancy.py): the
    # kernel materialises ~3 (S, K_TILE) f32 temporaries plus blocks, so
    # clamp the tile for large group sizes.
    budget = 10 * 1024 * 1024
    k_tile_max = (budget // (s * 4 * 3)) // 128 * 128
    if k_tile_max < 128:
        # even a one-lane-wide tile busts the budget; a silent over-budget
        # tile would spill or fail inside Mosaic with a cryptic error
        raise ValueError(
            f"group size {s} too large for the {budget // 2**20} MB VMEM "
            "budget (needs s <= "
            f"{budget // (128 * 4 * 3)}); reduce group_size"
        )
    k_tile = min(k_tile, k_tile_max)
    k = sources.shape[2]
    if k % k_tile:
        pad = k_tile - k % k_tile
        sources = jnp.pad(sources, ((0, 0), (0, 0), (0, pad)))
        k += pad
    n_k_tiles = k // k_tile

    tgt = jnp.zeros((g, s, 8), jnp.float32).at[:, :, 0:2].set(targets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, n_k_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, s, 8), lambda i, j, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, k_tile),
                lambda i, j, *_: (i, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s, 8), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((s, 8), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            softening=float(softening),
            n_k_tiles=n_k_tiles,
            k_tile=k_tile,
            section_offset=int(section_offset),
            compensated=compensated,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * s * k,
            bytes_accessed=(g * s * 8 + g * 8 * k + g * s * 8) * 4,
            transcendentals=g * s * k,
        ),
        interpret=interpret,
    )(lens.astype(jnp.int32), tgt, sources)
    return out[:, :, 0:2]
