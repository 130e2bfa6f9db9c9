"""Per-chip HBM model for the multi-chip Barnes-Hut modes + auto gate.

The reference stages its tree into fast memory only when an analytic
byte count says it fits: ``sharedMemSize = treeBytes <= 48KB ? bytes : 0``
(project.cu:971-974) — the gate itself is host-side arithmetic, not a
measurement.  This module is the same decision logic at HBM scale: an
analytic per-chip byte model of what each Barnes-Hut distribution mode
materializes, driving ``make_sharded_step(mode="auto")``:

* ``dp_barnes_hut_grouped`` (2D) / ``..._grouped3`` (3D) — all_gathers
  the full body cloud per chip: source bytes O(N), fastest when it fits
  (no halo exchange, no window placement).
* ``dp_barnes_hut_sharded`` / ``..._sharded3`` — 3-slab ppermute window:
  source bytes O(N/devices), the weak-scaling mode for body counts one
  chip cannot replicate (the reference report's named blocker,
  project_report.pdf p.7).

Both replicate the implicit pyramid (O(4^depth) / O(8^depth) — bounded
by the reference's own QUADTREE_MAX_SIZE planning constant,
project.cu:62), so the tree term is common and the gate decides on the
source term vs the per-chip HBM budget.
"""

from __future__ import annotations

from ..config import SimConfig

# Per-chip HBM on current TPU generations is 16-32 GiB; default to the
# conservative end, and leave the lion's share to the evaluation
# temporaries (group frontiers / direct lists / Pallas scratch), the
# integrator state, and XLA's own workspace.
HBM_BYTES_DEFAULT = 16 * 1024**3
SOURCE_BUDGET_FRACTION = 0.25  # sources may take this slice of HBM

_F32 = 4

# f32 fields materialized per tree cell per level:
# 2D: packed raw rows [4^l, 8] + finished TreeLevel (mass/comx/comy/count)
# 3D: packed raw rows [8^l, 16] (no separate finished level)
_TREE_FIELDS = {2: 8 + 4, 3: 16}
# f32 per body a mode's source window carries (coords + g*mass; the 2D
# sharded window also rides the Morton code alongside)
_ROW_FIELDS = {2: 4, 3: 5}


def tree_bytes(config: SimConfig) -> int:
    """Replicated implicit-pyramid bytes per chip (all levels, root..depth)."""
    dim = getattr(config, "n_dim", 2)
    branch = 2**dim
    depth = config.resolved_max_depth
    cells = (branch ** (depth + 1) - 1) // (branch - 1)
    return cells * _TREE_FIELDS[dim] * _F32


def source_bytes(config: SimConfig, n_devices: int, mode: str) -> int:
    """Per-chip *source-body* bytes a mode materializes (excl. tree).

    grouped: the all_gathered cloud, N rows.
    sharded: the 3-slab window [left | own | right] plus its sorted copy
    (the sort cannot alias its input), i.e. 2 * 3 * N/devices rows —
    still O(N/devices) by construction.
    """
    dim = getattr(config, "n_dim", 2)
    rows = _ROW_FIELDS[dim] * _F32
    n = config.n_bodies
    if "sharded" in mode:
        slab = -(-n // n_devices)  # ceil
        window = slab if n_devices == 1 else (2 if n_devices == 2 else 3) * slab
        return 2 * window * rows
    return n * rows


def per_chip_bytes(config: SimConfig, n_devices: int, mode: str) -> int:
    """Total modeled per-chip bytes for a Barnes-Hut mode: tree + sources."""
    return tree_bytes(config) + source_bytes(config, n_devices, mode)


def choose_bh_mode(
    config: SimConfig,
    n_devices: int,
    hbm_bytes: int | None = None,
    verbose: bool = False,
) -> str:
    """Pick grouped vs sharded Barnes-Hut from the HBM-fit model.

    Grouped wins whenever the replicated cloud fits the source budget
    (it is faster: no halo ppermutes, no window placement); sharded is
    the fallback that keeps per-chip sources O(N/devices).

    ``hbm_bytes=None`` resolves from ``config.hbm_bytes`` (set via the
    CLI ``--hbm-gb`` or the library config), falling back to the 16 GiB
    conservative default — so library callers of
    ``make_sharded_step(mode="auto")`` honor the same knob as the CLI.
    """
    if hbm_bytes is None:
        hbm_bytes = getattr(config, "hbm_bytes", None) or HBM_BYTES_DEFAULT
    dim = getattr(config, "n_dim", 2)
    suffix = "3" if dim == 3 else ""
    budget = int(hbm_bytes * SOURCE_BUDGET_FRACTION)
    grouped = per_chip_bytes(config, n_devices, "grouped")
    mode = (
        f"dp_barnes_hut_grouped{suffix}"
        if grouped <= budget
        else f"dp_barnes_hut_sharded{suffix}"
    )
    if verbose:
        import sys

        sharded = per_chip_bytes(config, n_devices, "sharded")
        print(
            f"memory gate: grouped {grouped/1e6:.1f} MB vs sharded "
            f"{sharded/1e6:.1f} MB per chip (budget {budget/1e6:.0f} MB, "
            f"{n_devices} devices) -> {mode}",
            file=sys.stderr,
        )
    return mode
