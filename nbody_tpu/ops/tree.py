"""Implicit dense quadtree pyramid: the TPU-native tree structure.

The reference builds a pointer-chasing adaptive quadtree on the host every
step (buildTree project.cu:575-591: recursive QuadInsert + recursive
ComputeMass) and ships it to the GPU (project.cu:968).  That structure is
hostile to TPU (dynamic size, pointer chasing, per-node recursion), so the
tree is re-architected as a *dense implicit pyramid*:

* level L = max_depth is a 2^L x 2^L cell grid; each body maps to a cell
  via its Morton code; per-cell mass / mass-weighted position / occupancy
  count are built with one segment-sum each (the parallel-friendly build
  the reference's report wishes for: "Morton codes + sorting + level-wise
  subtree builds", project_report.pdf p.7);
* coarser levels are 4->1 reductions (Morton order makes the 4 children of
  cell c contiguous at 4c..4c+3), replacing recursive ComputeMass;
* total nodes = (4^(max_depth+1)-1)/3 = 349,525 for max_depth=9 — exactly
  the reference's QUADTREE_MAX_SIZE (project.cu:62) — about 5.6 MB of f32
  fields, small enough to be VMEM-resident during traversal.

Equivalence to the adaptive tree (used by the traversal in barnes_hut.py):
a cell with count==1 *is* the adaptive tree's singleton leaf (same mass and
COM at every ancestor level, so accepting it at any level along the chain
yields a bit-equal interaction); a cell with count>=2 at level max_depth is
the reference's aggregated max-depth pseudo-body (project.cu:358-382);
empty cells correspond to the empty children the reference skips.

Cell assignment uses the reference's *recursive midpoint* rule
(DetermineChild, project.cu:348-356: >= goes to the high half, midpoints
recomputed per level as (lo+hi)/2), not a linear quantisation, so cell
boundaries match the oracle bit-for-bit in matching precision.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import MAX_DEPTH_DEFAULT, ROOT_PAD_FRACTION


class TreeLevel(NamedTuple):
    mass: jax.Array  # [4^level] total mass per cell
    comx: jax.Array  # [4^level] centre of mass x (0 where empty)
    comy: jax.Array  # [4^level]
    count: jax.Array  # [4^level] int32 bodies per cell


class Quadtree(NamedTuple):
    levels: Tuple[TreeLevel, ...]  # levels[0] = root .. levels[max_depth]
    bounds: jax.Array  # [4] x_min, x_max, y_min, y_max (padded root box)
    codes: jax.Array  # [N] int32 leaf-cell Morton code per body

    @property
    def max_depth(self) -> int:
        return len(self.levels) - 1


def root_bounds(positions: jax.Array) -> jax.Array:
    """ComputeRootBounds (project.cu:536-573): min/max + 10% of the max
    dimension as pad; 1e-6 fallback for a degenerate (single-point) cloud."""
    x = positions[:, 0]
    y = positions[:, 1]
    x_min, x_max = jnp.min(x), jnp.max(x)
    y_min, y_max = jnp.min(y), jnp.max(y)
    max_dim = jnp.maximum(x_max - x_min, y_max - y_min)
    pad = jnp.where(max_dim == 0.0, 1e-6, ROOT_PAD_FRACTION * max_dim)
    return jnp.stack([x_min - pad, x_max + pad, y_min - pad, y_max + pad])


def morton_codes(
    positions: jax.Array, bounds: jax.Array, max_depth: int
) -> jax.Array:
    """Per-body leaf-cell Morton code by recursive midpoint subdivision.

    Bit layout: two bits per level, root-first; the low bit of each pair is
    the x decision, the high bit the y decision — matching the reference's
    child numbering 0=BL, 1=BR, 2=TL, 3=TR (DetermineChild,
    project.cu:348-356).  The cell index of a body at level l is
    ``code >> 2*(max_depth - l)``.
    """
    x = positions[:, 0]
    y = positions[:, 1]
    x_lo = jnp.full_like(x, bounds[0])
    x_hi = jnp.full_like(x, bounds[1])
    y_lo = jnp.full_like(y, bounds[2])
    y_hi = jnp.full_like(y, bounds[3])
    code = jnp.zeros(x.shape, dtype=jnp.int32)
    for _ in range(max_depth):
        mid_x = (x_lo + x_hi) * 0.5
        mid_y = (y_lo + y_hi) * 0.5
        bx = (x >= mid_x).astype(jnp.int32)
        by = (y >= mid_y).astype(jnp.int32)
        x_lo = jnp.where(bx == 1, mid_x, x_lo)
        x_hi = jnp.where(bx == 1, x_hi, mid_x)
        y_lo = jnp.where(by == 1, mid_y, y_lo)
        y_hi = jnp.where(by == 1, y_hi, mid_y)
        code = (code << 2) | (by << 1) | bx
    return code


def leaf_aggregates(
    positions: jax.Array,
    masses: jax.Array,
    codes: jax.Array,
    max_depth: int,
):
    """Per-leaf-cell (mass, mass*x, mass*y, x, y, count) via one
    segment-sum each — the parallel-insert replacement for QuadInsert.
    Each device computes this over its *local* bodies; a psum over the
    mesh yields the global tree (see nbody_tpu.parallel).

    The unweighted position sums (x, y) exist so that a cell containing
    exactly one body gets a COM *bit-equal* to that body's position (the
    weighted m*x/m round-trip is not exact in f32): singleton cells then
    self-exclude in interaction kernels via the d2 > 0 guard, replacing
    the reference's occupant-index bookkeeping (project.cu:646)."""
    n_leaf = 4**max_depth
    m = jax.ops.segment_sum(masses, codes, num_segments=n_leaf)
    mx = jax.ops.segment_sum(
        masses * positions[:, 0], codes, num_segments=n_leaf
    )
    my = jax.ops.segment_sum(
        masses * positions[:, 1], codes, num_segments=n_leaf
    )
    sx = jax.ops.segment_sum(positions[:, 0], codes, num_segments=n_leaf)
    sy = jax.ops.segment_sum(positions[:, 1], codes, num_segments=n_leaf)
    cnt = jax.ops.segment_sum(
        jnp.ones(codes.shape, jnp.int32), codes, num_segments=n_leaf
    )
    return m, mx, my, sx, sy, cnt


def pyramid_from_leaves(
    m: jax.Array,
    mx: jax.Array,
    my: jax.Array,
    sx: jax.Array,
    sy: jax.Array,
    cnt: jax.Array,
    bounds: jax.Array,
    codes: jax.Array,
    max_depth: int,
    dtype=jnp.float32,
) -> Quadtree:
    """4->1 reductions up the pyramid (replaces recursive ComputeMass)."""

    def finish(m, mx, my, sx, sy, cnt) -> TreeLevel:
        safe = jnp.where(m > 0, m, 1.0).astype(dtype)
        # exact position for singleton cells (sums of a single term are
        # exact at every level of the chain)
        comx = jnp.where(cnt == 1, sx, (mx / safe)).astype(dtype)
        comy = jnp.where(cnt == 1, sy, (my / safe)).astype(dtype)
        return TreeLevel(
            mass=m.astype(dtype), comx=comx, comy=comy, count=cnt
        )

    levels: List[TreeLevel] = [finish(m, mx, my, sx, sy, cnt)]
    for _ in range(max_depth):
        m = m.reshape(-1, 4).sum(axis=1)
        mx = mx.reshape(-1, 4).sum(axis=1)
        my = my.reshape(-1, 4).sum(axis=1)
        sx = sx.reshape(-1, 4).sum(axis=1)
        sy = sy.reshape(-1, 4).sum(axis=1)
        cnt = cnt.reshape(-1, 4).sum(axis=1)
        levels.append(finish(m, mx, my, sx, sy, cnt))
    levels.reverse()  # root first
    return Quadtree(levels=tuple(levels), bounds=bounds, codes=codes)


@functools.partial(jax.jit, static_argnames=("max_depth",))
def build_quadtree(
    positions: jax.Array,
    masses: jax.Array,
    max_depth: int = MAX_DEPTH_DEFAULT,
    bounds: jax.Array | None = None,
) -> Quadtree:
    """Whole-tree build as segment-sums + 4->1 reductions (no recursion)."""
    if bounds is None:
        bounds = root_bounds(positions)
    codes = morton_codes(positions, bounds, max_depth)
    m, mx, my, sx, sy, cnt = leaf_aggregates(
        positions, masses, codes, max_depth
    )
    return pyramid_from_leaves(
        m, mx, my, sx, sy, cnt, bounds, codes, max_depth,
        dtype=positions.dtype,
    )


def level_cell_size(bounds: jax.Array, level: int) -> jax.Array:
    """node_size = max cell dimension at a level (the reference computes
    max(dx, dy) per node, project.cu:637-639; every cell at a level shares
    the same extent in the dense pyramid)."""
    sx = (bounds[1] - bounds[0]) / (1 << level)
    sy = (bounds[3] - bounds[2]) / (1 << level)
    return jnp.maximum(sx, sy)
