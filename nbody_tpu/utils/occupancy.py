"""Tile-size selection from hardware limits — the TPU analogue of the
reference's occupancy model.

The reference computes a launch configuration analytically from register
pressure and shared-memory budget (getOptimalBlockSize, project.cu:163-217,
fed by ptxas register counts project.cu:71-73) and gates its fast path on
the tree fitting in 48KB shared memory (project.cu:971-974).  On TPU the
corresponding resources are VMEM (~16 MB/core) and the (8, 128) VPU lane
geometry; this module picks interaction-tile shapes that maximise the
source tile (arithmetic intensity) subject to the VMEM working set, and
exposes the fits-in-VMEM gate used by the Barnes-Hut pyramid.
"""

from __future__ import annotations

import dataclasses

# v5e-class defaults; override per platform if needed.
VMEM_BYTES = 16 * 1024 * 1024
LANES = 128
SUBLANES = 8


@dataclasses.dataclass(frozen=True)
class TileConfig:
    target_block: int
    source_block: int
    working_set_bytes: int
    vmem_fraction: float


def allpairs_tiles(
    n_bodies: int,
    bytes_per_element: int = 4,
    vmem_bytes: int = VMEM_BYTES,
    vmem_budget_fraction: float = 0.7,
    n_live_tiles: int = 4,
) -> TileConfig:
    """Pick (target_block, source_block) for the all-pairs kernel.

    The kernel materialises ~n_live_tiles (TB, SB) f32 temporaries (dx,
    dy, d2/w, and a mask) plus the small packed blocks, so the constraint
    is  n_live_tiles * TB * SB * 4B  <= budget.  Larger SB amortises the
    per-target load; TB stays a sublane multiple.  Measured on v5e:
    (256..512, 1024..2048) are within noise of each other and
    (512, 4096) OOMs — consistent with this model (SURVEY.md, bench
    notes).
    """
    budget = int(vmem_bytes * vmem_budget_fraction)
    tb = 256
    # largest power-of-two SB that fits
    sb = LANES
    while (
        n_live_tiles * tb * (sb * 2) * bytes_per_element <= budget
        and sb * 2 <= 4096
    ):
        sb *= 2
    # shrink tiles for small problems
    tb = min(tb, max(SUBLANES, 1 << (max(n_bodies, 8) - 1).bit_length() - 1))
    sb = min(sb, max(LANES, 1 << (max(n_bodies, 128)).bit_length()))
    ws = n_live_tiles * tb * sb * bytes_per_element
    return TileConfig(
        target_block=tb,
        source_block=sb,
        working_set_bytes=ws,
        vmem_fraction=ws / vmem_bytes,
    )


def tree_fits_vmem(
    max_depth: int,
    fields: int = 4,
    bytes_per_element: int = 4,
    vmem_bytes: int = VMEM_BYTES,
) -> bool:
    """The 48KB shared-memory gate analogue (project.cu:971-974): does the
    whole pyramid fit on-chip?  For the reference's depth cap (max_depth=9:
    349,525 nodes) the answer is always yes on TPU (~5.6 MB) — the gate
    exists for deeper configurations."""
    nodes = (4 ** (max_depth + 1) - 1) // 3
    return nodes * fields * bytes_per_element <= vmem_bytes
