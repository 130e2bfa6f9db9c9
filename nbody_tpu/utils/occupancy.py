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
    vmem_budget_fraction: float = 0.75,
    n_live_tiles: int = 3,
    verbose: bool = False,
) -> TileConfig:
    """Pick (target_block, source_block) for the all-pairs kernel.

    The kernel keeps ~n_live_tiles (TB, SB) f32 temporaries live at once
    (Mosaic fuses the elementwise chain dx/dy/d2/w down to about three
    concurrent buffers), so the constraint is
    ``n_live_tiles * TB * SB * 4B <= budget``.  Measured on the bench
    chip at N=64K (slope method, 3 reps): (512, 2048) 251.5 Gpairs/s,
    (256, 2048) 243.0, (512, 1024) 217.1, (256, 4096) 209.1,
    (1024, 2048) fails to compile (VMEM) — the model's feasibility edge
    sits exactly between 4 MiB and 8 MiB per temporary, hence
    n_live_tiles=3 with a 0.75 budget fraction.
    """
    budget = int(vmem_bytes * vmem_budget_fraction)
    tb = 512  # measured best; larger busts VMEM, smaller wastes sublanes
    # largest power-of-two SB that fits the live-temporary budget
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
    cfg = TileConfig(
        target_block=tb,
        source_block=sb,
        working_set_bytes=ws,
        vmem_fraction=ws / vmem_bytes,
    )
    if verbose:
        _dump_decision("allpairs", n_bodies, cfg, budget, n_live_tiles)
    return cfg


def _dump_decision(
    kernel: str, n_bodies: int, cfg: TileConfig, budget: int, live: int
) -> None:
    """The reference's occupancy-model dump (project.cu:201-214 prints
    blocks/SM, threads/SM and the limiting resource when asked)."""
    import sys

    print(
        f"occupancy[{kernel}]: n={n_bodies} -> target_block="
        f"{cfg.target_block} source_block={cfg.source_block} | "
        f"working set {cfg.working_set_bytes / 2**20:.2f} MiB "
        f"({live} live tiles) of {budget / 2**20:.2f} MiB budget "
        f"({cfg.vmem_fraction * 100:.0f}% of VMEM)",
        file=sys.stderr,
    )


def resolve_tiles(
    n_bodies: int,
    target_block=None,
    source_block=None,
    verbose: bool = False,
):
    """Occupancy-driven tile selection with explicit override — the
    analogue of the reference calling getOptimalBlockSize before every
    launch (project.cu:977/994).  ``None`` means "let the model decide"."""
    cfg = allpairs_tiles(n_bodies, verbose=verbose)
    tb = target_block if target_block else cfg.target_block
    sb = source_block if source_block else cfg.source_block
    return tb, sb


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
