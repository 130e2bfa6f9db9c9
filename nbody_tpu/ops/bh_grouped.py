"""Group-based Barnes-Hut: Morton-sorted body groups share one traversal.

The per-body frontier traversal (barnes_hut.py) is semantically exact but
gather-bound on TPU: [N, frontier] gathers per level dominate (measured
~7 s/step at N=64K vs 0.5 ms for the tree build).  This module is the
TPU-native answer, the standard vectorised tree-code design (cf. the
SIMD/GPU tree-method literature in PAPERS.md — patterns only):

1. sort bodies by Morton code (jax.lax.sort_key_val) so consecutive
   bodies are spatially compact;
2. cut the sorted order into fixed-size groups (static shapes); per group
   compute the bounding box of its members;
3. traverse the pyramid ONCE per group with a conservative acceptance
   test: accept cell c iff  size_l / d_min < theta  where d_min is the
   distance from the group's bbox to the cell COM.  Every member body has
   d >= d_min, so each member's own theta test also passes — the group
   decision only ever *opens more* than the reference's per-body DFS
   (project.cu:641-643), i.e. it is at least as accurate;
4. accepted cells and terminal cells (singletons, max-depth aggregates)
   are compacted into a per-group interaction list of (x, y, mass);
5. evaluation is dense and regular: group bodies x interaction list, the
   same VPU pattern as the all-pairs kernel.  Gather volume drops by the
   group size (256x) and all heavy compute is vectorised.

Self-interaction: singleton cells carry bit-exact body positions (see
tree.leaf_aggregates), so a body meeting its own singleton cell has
d2 == 0 exactly and the d2 > 0 guard excludes it — no occupant-index
bookkeeping.  Max-depth multi-body cells are included even for their own
members, preserving the reference's aggregate-self-pull quirk
(project.cu:378/760).

group_size=1 makes the bbox a point, d_min the exact body-COM distance,
and the acceptance identical to the reference traversal.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import (
    BH_SOFTENING,
    MASS_SKIP_THRESHOLD,
    MAX_DEPTH_DEFAULT,
    THETA_DEFAULT,
)
from .tree import (
    RAW_CNT,
    RAW_M,
    RAW_MX,
    RAW_MY,
    RAW_OCC,
    RAW_SX,
    RAW_SY,
    Quadtree,
    build_quadtree,
    level_cell_size,
    morton_codes,
)


_INT_MAX = jnp.int32(2**31 - 1)


def _pow2_ceil(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def frontier_peak(n_bodies: int) -> int:
    """Measured peak frontier demand grows ~4*sqrt(N) (gs=2048, n_sub=16,
    theta=0.5): 722 @64K, 1452 @256K, 2646 @1M.  Next power of two with
    ~1.5x headroom, clamped to [1024, 8192]."""
    return min(8192, max(1024, _pow2_ceil(int(4 * n_bodies**0.5))))


# 2D default Morton group size (``group_size=None``).  2048 at every N:
# the round-2 A/B moved 512 -> 2048 (fewer groups = proportionally fewer
# per-level gathers, accuracy IMPROVES — conservative opening only ever
# opens more); a 4096 probe is only measured in 3D where it wins in the
# [256K, 768K) band (bh3d.default_group_size3) — 2D headline scales
# (40,960-64K) would drop to 10-16 groups and starve the group_chunk
# pipeline.
DEFAULT_GROUP_SIZE = 2048


def cap_defaults(group_size: int, n_bodies: int) -> dict:
    """Interaction-list cap defaults, calibrated on measured per-group
    demand (scripts/demand.py; uniform + two-blob collapsed
    distributions, gs=2048, n_sub=16):

    | N    | approx (uni/blob) | direct cells | frontier (uni/blob) |
    |------|-------------------|--------------|----------------------|
    | 64K  | 398 / 566         | 517 / 2,018  | 722 / 1,468          |
    | 256K | 1,062             | 1,073        | 1,452                |
    | 1M   | 1,818 / 5,750     | 1,743 / 933  | 2,646 / 5,104        |

    The collapsed state dominates approx demand at large N (deep
    aggregates) and direct demand at small N (dense near fields at
    coarse leaf resolution); the round-2 uniform-only calibration
    overflowed on blobs at 64K (direct) and 1M (approx + frontier
    max-depth tail) — caught by the round-3 calibration tooling.  The
    overflow flag guards any distribution beyond the headroom.
    """
    peak = frontier_peak(n_bodies)
    return dict(
        # rounded up to a multiple of 2048 so the Pallas section offset
        # tiles at the full k_tile (list_eval_pallas); 7/4*peak covers
        # the 1M-blobs 5,750 with 1.42x headroom
        list_cap=max(2048, -(-(7 * peak // 4) // 2048) * 2048),
        # floor 2,560 covers the 64K-blobs 2,018 (1.27x); 3/4*peak
        # keeps the uniform large-N scaling (1.76x at 1M); a direct
        # cell holds >= 2 bodies, so n//2 bounds the count at small N
        # (keeps small-N compiles narrow)
        direct_cap=min(
            max(2560, 3 * peak // 4), max(256, n_bodies // 2)
        ),
        direct_body_cap=max(24576, 16 * peak),
        frontier_cap=peak,
        # merged-run cap for the runs evaluator: measured merged-run
        # demand (scripts/demand.py) 64K 39/75, 1M 166/98 uniform/blobs
        # — 2D near fields union into few runs at every scale; flat 256
        # keeps >= 1.54x headroom at the 1M-uniform peak
        run_cap=256,
    )


def frontier_schedule(
    peak: int, max_depth: int, n_bodies: int
) -> Tuple[int, ...]:
    """Per-level frontier capacities.

    A flat cap pays the peak at EVERY level; the measured demand is a
    hump peaking at the level where bodies/cell ~ 16 (uniform states;
    e.g. level 6 at N=64K, level 8 at N=1M) with a secondary tail at
    max_depth for collapsed states (measured up to 2*peak: 1,468 @64K /
    5,104 @1M two-blob).  The schedule sizes the peak level at ``peak``,
    its neighbours at peak/2..peak/8 by distance, and the deepest TWO
    levels at ``2*peak`` (the collapsed tail peaks at max_depth-1 or
    max_depth depending on N), cutting total gather rows ~3x vs a flat
    2*peak cap at N=64K; the overflow flag still guards any
    distribution that beats it.

    The hump level l* = log4(N/16) holds for a uniform cloud filling the
    root bbox; it is NOT stable mid-run.  Two measured failure modes
    (round 3, N=24,576): (a) fractional l* — demand straddles floor(l*)
    and ceil(l*), and a round()-picked single peak level overflowed at
    step 0; (b) after one unsoftened close encounter ejects outliers,
    the root bbox expands and the core's per-cell density rises, shifting
    the hump DEEPER by log2(bbox growth) — level-7/8 demand then beat
    peak/2 at step 1.  Clustering and bbox expansion can only ever move
    the hump deeper (the initial uniform state is the density minimum),
    so every level from floor(l*) down to max_depth gets the full peak;
    levels above the hump keep the pruned ramp (their demand is bounded
    by cell count and geometry, not density).
    """
    import math

    lf = math.log(max(n_bodies, 256) / 16, 4)
    lo_star = min(max_depth, max(4, math.floor(lf)))
    shape = []
    for level in range(max_depth + 1):
        if level <= 3:
            c = 4**level
        elif level >= max_depth - 1:
            # collapsed-state tail peaks at max_depth-1 or max_depth
            # (scripts/demand.py blobs: 1,468 @l8/md=9 at 64K, 5,104
            # @l9=md at 1M — both above the old flat peak)
            c = 2 * peak
        elif level >= lo_star:
            c = peak
        else:
            c = peak >> min(lo_star - level, 3)
        shape.append(int(min(c, 2 * peak, 4**level)))
    return tuple(shape)


def _sort_compact(mask, arrays, cap):
    """Compact masked row entries to the left and truncate to ``cap``.

    Scatter-free: TPU scatters serialize, but lax.sort is fast bitonic VPU
    work.  Entries keep their left-to-right order (key = column index for
    valid, INT_MAX for invalid).

    Returns (compacted arrays [G, cap], overflow [G] bool).
    """
    g, f = mask.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, f), 1)
    key = jnp.where(mask, col, _INT_MAX)
    sorted_ = jax.lax.sort(
        [key] + list(arrays), dimension=1, num_keys=1, is_stable=False
    )
    out = [a[:, :cap] for a in sorted_[1:]]
    overflow = jnp.sum(mask, axis=1) > cap
    return out, overflow


def _collect_lists(
    bbox: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],  # [G, Q] each
    tree: Quadtree,
    *,
    theta: float,
    softening: float,
    frontier_caps: Tuple[int, ...],
    list_cap: int,
    direct_cap: int,
    direct_cell_max: int,
    window_cells=None,
    return_demand: bool = False,
    quarter_bits: bool = False,
):
    """Per-group interaction lists via a dual (cell-vs-group-bbox) walk.

    Classification per frontier cell (conservative d_min from the group
    bbox to the cell COM; every member body's own theta test is implied):

    * count==1                        -> approx list (exact point mass)
    * theta-ok, count>=2              -> approx list (COM aggregate)
    * level==max_depth, count>=2      -> approx list (the reference's
      max-depth aggregated pseudo-body, project.cu:358-382 — own members
      included, preserving the aggregate-self-pull quirk)
    * not theta-ok, 2<=count<=direct_cell_max -> direct list as a body
      *range*: Morton sorting makes every cell a contiguous slice of the
      sorted body array, so close-range cells are resolved exactly by
      pairwise interaction instead of opening them to singleton depth
      (this is what bounds the frontier: without it, every cell inside
      the group's own bbox would be opened all the way down)
    * otherwise                       -> open (children to next frontier)

    Returns (cells [G, L, 3] (x, y, mass) zero-mass padded,
             ranges [G, D, 2] (start, count) zero-count padded,
             overflow [G] bool).

    ``window_cells=(c_lo, c_hi)`` (traced leaf-cell scalars) restricts
    direct emission to cells whose leaf span lies inside
    [c_lo, c_hi] — the sharded multi-chip mode's locally-resident
    source window.  Out-of-window close cells keep OPENING instead and
    terminate as singleton cells / max-depth aggregates, which need only
    the replicated pyramid — exactly the reference DFS's own treatment
    of every close cell (it never does pairwise-beyond-singletons), so
    physics stays within the reference approximation class while no
    chip ever touches a non-resident body.
    """
    # Sub-bboxes: each group carries Q bounding boxes (quarters of its
    # Morton run).  d_min = min over sub-boxes is a tighter-but-still-valid
    # lower bound on any member's distance; critically, a group whose run
    # straddles a Morton seam (e.g. the domain centre) has a huge union
    # bbox but tight quarters, so it no longer opens half the tree.
    x0, x1, y0, y1 = bbox  # [G, Q]
    g = x0.shape[0]
    f32 = x0.dtype
    max_depth = tree.max_depth
    overflow = jnp.zeros((g,), bool)
    demand = []  # return_demand: per-level pre-truncation calibration
    #              measurements (see the 3D mirror's docstring)

    # Per-cell packed rows come straight from the tree build
    # (Quadtree.raw, cols per tree.RAW_*): a row gather costs the same as
    # a single-field gather on TPU (~7 ns/row, latency-bound), so the
    # traversal gathers whole raw rows and derives COM (division) and the
    # child-occupancy prune bits from the gathered [G, F, 8] array — no
    # per-level re-packing and no second gather into the child level.

    # per-cell body ranges in the Morton-sorted order: cumulative counts
    # over the finest level give [start, end) for any cell at any level
    leaf_cnt = tree.levels[max_depth].count
    leaf_cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(leaf_cnt).astype(jnp.int32)]
    )  # [4^max_depth + 1]

    frontier = jnp.zeros((g, 1), jnp.int32)  # root
    fcap = 1

    # per-level emitted candidates, concatenated and compacted ONCE at the
    # end (one sort instead of per-level scatters)
    app_x, app_y, app_m, app_mask = [], [], [], []
    dir_s, dir_c, dir_mask = [], [], []
    # quarter_bits payloads: per-quarter theta-fail bitmask + the cell
    # COM, carried through the direct compaction for split evaluation
    dir_b, dir_x, dir_y, dir_m = [], [], [], []

    for level in range(max_depth + 1):
        valid = frontier >= 0
        idx = jnp.where(valid, frontier, 0)
        rows = tree.raw[level][idx]  # [G, F, 8] — the one gather
        m = rows[..., RAW_M]
        cnt = rows[..., RAW_CNT]
        one = jnp.asarray(1.0, f32)
        # COM derived post-gather (cheap: [G, F] not [4^l]); singleton
        # cells take the exact position sum (see tree.leaf_raw)
        safe = jnp.where(m > 0, m, one)
        cx = jnp.where(
            cnt == one, rows[..., RAW_SX], rows[..., RAW_MX] / safe
        )
        cy = jnp.where(
            cnt == one, rows[..., RAW_SY], rows[..., RAW_MY] / safe
        )

        # distance from each sub-bbox to the cell COM (0 if inside); the
        # binding bound is the minimum over sub-boxes
        cxe = cx[:, None, :]  # [G, 1, F]
        cye = cy[:, None, :]
        dx = jnp.maximum(
            jnp.maximum(x0[:, :, None] - cxe, cxe - x1[:, :, None]), 0.0
        )  # [G, Q, F]
        dy = jnp.maximum(
            jnp.maximum(y0[:, :, None] - cye, cye - y1[:, :, None]), 0.0
        )
        d2all = dx * dx + dy * dy  # [G, Q, F]
        soft = jnp.asarray(softening, f32)
        # sqrt AFTER the min over sub-bboxes: bit-identical (sqrt is
        # monotone, correctly rounded) at 1/Q of the sqrt volume
        d_min = jnp.sqrt(jnp.min(d2all, axis=1)) + soft  # [G, F]
        size = level_cell_size(tree.bounds, level).astype(f32)
        theta_ok = size < theta * d_min

        nonempty = valid & (cnt > 0) & (m > MASS_SKIP_THRESHOLD)
        single = nonempty & (cnt == one)
        multi = nonempty & (cnt > one)
        approx = single | (multi & (theta_ok | (level == max_depth)))
        direct = (
            multi
            & ~theta_ok
            & (level != max_depth)
            & (cnt <= direct_cell_max)
        )
        if window_cells is not None:
            # pure int math on the frontier (no gathers): a cell at this
            # level spans leaf cells [idx << s, (idx + 1) << s)
            c_lo, c_hi = window_cells
            shift_w = 2 * (max_depth - level)
            in_win = ((idx << shift_w) >= c_lo) & (
                ((idx + 1) << shift_w) <= c_hi + 1
            )
            direct = direct & in_win

        app_x.append(cx)
        app_y.append(cy)
        app_m.append(jnp.where(approx, m, 0.0))
        app_mask.append(approx)

        # direct cells are carried as their first-leaf-cell index
        # (c << 2*(max_depth-level), pure int math — the leaf_cum lookup
        # happens once on the compacted list, not per frontier entry)
        shift = 2 * (max_depth - level)
        dir_s.append(idx << shift)
        dir_c.append(jnp.where(direct, cnt.astype(jnp.int32), 0))
        dir_mask.append(direct)
        if quarter_bits:
            # per-quarter theta verdicts (quarter q = Morton sub-bboxes
            # 4q..4q+3): bit set where the cell is too close for that
            # quarter's own bodies; direct implies >= 1 bit set (the
            # binding sub-bbox lives in some quarter)
            qn = d2all.shape[1] // 4
            dq = (
                jnp.sqrt(jnp.min(d2all.reshape(g, 4, qn, -1), axis=2))
                + soft
            )  # [G, 4, F]
            fail_q = size >= theta * dq
            bits = jnp.sum(
                jnp.where(
                    fail_q,
                    jnp.asarray(
                        [1, 2, 4, 8], jnp.int32
                    )[None, :, None],
                    0,
                ),
                axis=1,
                dtype=jnp.int32,
            )
            dir_b.append(jnp.where(direct, bits, 0))
            dir_x.append(cx)
            dir_y.append(cy)
            dir_m.append(jnp.where(direct, m, 0.0))

        if level == max_depth:
            break

        open_ = multi & ~theta_ok & ~direct
        children = (
            idx[:, :, None] * 4 + jnp.arange(4, dtype=jnp.int32)
        ).reshape(g, -1)
        # children pruned by the occupancy bits delivered in the parent's
        # own raw row — no extra gather
        occ = rows[..., RAW_OCC].astype(jnp.int32)
        child_bits = (
            (occ[:, :, None] >> jnp.arange(4, dtype=jnp.int32)) & 1
        ).reshape(g, -1)
        cmask = jnp.repeat(open_, 4, axis=1) & (child_bits > 0)

        if return_demand:
            demand.append(jnp.max(jnp.sum(cmask, axis=1)))

        next_cap = min(4 * fcap, frontier_caps[level + 1])
        if next_cap == 4 * fcap:
            # the cap doesn't bind: no truncation is possible, so the
            # compaction sort is pure cosmetics — carry the children
            # with -1 holes instead (the walk masks on frontier >= 0)
            frontier = jnp.where(cmask, children, -1)
        else:
            (nf,), ovf = _sort_compact(
                cmask, [jnp.where(cmask, children, -1)], next_cap
            )
            overflow = overflow | ovf
            frontier = nf
        fcap = next_cap

    (lx, ly, lm), ovf_a = _sort_compact(
        jnp.concatenate(app_mask, axis=1),
        [
            jnp.concatenate(app_x, axis=1),
            jnp.concatenate(app_y, axis=1),
            jnp.concatenate(app_m, axis=1),
        ],
        list_cap,
    )
    dir_payload = [
        jnp.concatenate(dir_s, axis=1),
        jnp.concatenate(dir_c, axis=1),
    ]
    if quarter_bits:
        dir_payload += [
            jnp.concatenate(dir_b, axis=1),
            jnp.concatenate(dir_x, axis=1),
            jnp.concatenate(dir_y, axis=1),
            jnp.concatenate(dir_m, axis=1),
        ]
    compacted, ovf_d = _sort_compact(
        jnp.concatenate(dir_mask, axis=1), dir_payload, direct_cap
    )
    dleaf, dc = compacted[0], compacted[1]
    # one gather on the compacted list resolves leaf cell -> body range
    ds = jnp.where(dc > 0, leaf_cum[jnp.where(dc > 0, dleaf, 0)], 0)
    overflow = overflow | ovf_a | ovf_d

    ranges = jnp.stack([ds, dc], axis=-1)  # [G, D, 2]
    quarters = (
        dict(bits=compacted[2], com=tuple(compacted[3:5]),
             mass=compacted[5])
        if quarter_bits
        else None
    )
    if return_demand:
        stats = dict(
            frontier=jnp.stack(demand),
            approx=jnp.max(
                jnp.sum(jnp.concatenate(app_mask, axis=1), axis=1)
            ),
            direct=jnp.max(
                jnp.sum(jnp.concatenate(dir_mask, axis=1), axis=1)
            ),
        )
        return (lx, ly, lm), ranges, overflow, stats
    if quarter_bits:
        return (lx, ly, lm), ranges, overflow, quarters
    return (lx, ly, lm), ranges, overflow


def _evaluate_pallas(
    positions_grouped: jax.Array,  # [G, S, 2]
    lists,  # (lx, ly, lm) approx lists [G, L] each (lm zero-padded MASS)
    direct_sb,  # (sb_idx, lo, hi) [G, C] each
    sorted_x: jax.Array,
    sorted_y: jax.Array,
    sorted_gm: jax.Array,
    *,
    g_const: float,
    softening: float,
    compensated: bool = False,
    dynamic: bool = True,
    k_tile: int = 2048,
):
    """Build the combined packed source list [G, 8, K] (approx cells +
    masked superblock bodies) in XLA — cheap, it is only the gathered data
    itself — then evaluate bodies x list in a Pallas streaming kernel
    (ops.list_eval), which keeps all pairwise intermediates in VMEM.

    ``dynamic`` (default) uses the occupancy-proportional manual-DMA
    kernel (list_eval_dynamic: per-group cost ~ actual list length);
    ``compensated`` forces the grid kernel (the Kahan path lives there).
    """
    from .list_eval import list_eval_dynamic, list_eval_pallas

    f32 = positions_grouped.dtype
    lx, ly, lm = lists
    # pad the approx section to a multiple of 2048: a sub-cap candidate
    # total yields an arbitrary-width section, which must still tile at
    # the kernel's k_tile (see ops/bh3d._evaluate_pallas_3d)
    apad = (-lx.shape[1]) % 2048
    if apad:
        lx, ly, lm = (
            jnp.pad(a, ((0, 0), (0, apad))) for a in (lx, ly, lm)
        )
    sb_idx, lo, hi = direct_sb
    g_groups = lx.shape[0]

    # superblock gather (one 24-wide row per 8 bodies) + lane masking
    ns = sorted_x.shape[0]
    ns_pad = ((ns + _SB - 1) // _SB) * _SB
    pad = ns_pad - ns

    def pad1(a):
        return jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a

    sb_packed = jnp.concatenate(
        [
            pad1(sorted_x).reshape(-1, _SB),
            pad1(sorted_y).reshape(-1, _SB),
            pad1(sorted_gm).reshape(-1, _SB),
        ],
        axis=1,
    )  # [Nsb, 24]
    dmask = sb_idx >= 0
    rows = sb_packed[jnp.where(dmask, sb_idx, 0)]  # [G, C, 24]
    lane = jnp.arange(_SB, dtype=jnp.int32)
    body_id = jnp.where(dmask, sb_idx, 0)[:, :, None] * _SB + lane
    lane_ok = (
        dmask[:, :, None]
        & (body_id >= lo[:, :, None])
        & (body_id < hi[:, :, None])
    )
    width = sb_idx.shape[1] * _SB
    dxs = rows[:, :, 0:_SB].reshape(g_groups, width)
    dys = rows[:, :, _SB : 2 * _SB].reshape(g_groups, width)
    dws = jnp.where(lane_ok, rows[:, :, 2 * _SB :], 0.0).reshape(
        g_groups, width
    )

    src_x = jnp.concatenate([lx, dxs], axis=1)  # [G, K]
    src_y = jnp.concatenate([ly, dys], axis=1)
    src_w = jnp.concatenate(
        [jnp.asarray(g_const, f32) * lm, dws], axis=1
    )
    k = src_x.shape[1]
    # one concatenate instead of three dynamic-update-slices into zeros
    # (each DUS re-touches the whole [G, 8, K] buffer)
    zero = jnp.zeros((g_groups, 1, k), f32)
    src = jnp.concatenate(
        [src_x[:, None, :], src_y[:, None, :], src_w[:, None, :]]
        + [zero] * 5,
        axis=1,
    )

    # occupied lengths of the two left-compacted sections (emitted approx
    # cells always have mass > 0; valid superblocks have sb_idx >= 0)
    lens = jnp.stack(
        [
            jnp.sum(lm > 0, axis=1).astype(jnp.int32),
            _SB * jnp.sum(dmask, axis=1).astype(jnp.int32),
        ],
        axis=0,
    )  # [2, G]: SMEM-friendly layout (see list_eval_pallas)

    if dynamic and not compensated:
        acc = list_eval_dynamic(
            positions_grouped.astype(jnp.float32),
            src,
            lens,
            softening=float(softening),
            section_offset=lx.shape[1],
            k_tile=k_tile,
        )
    else:
        acc = list_eval_pallas(
            positions_grouped.astype(jnp.float32),
            src,
            lens,
            softening=float(softening),
            section_offset=lx.shape[1],
            compensated=compensated,
        )
    return acc[:, :, 0], acc[:, :, 1]


_SB = 8  # bodies per superblock (one packed gather row)

# Runtime gate for segment-packed runs evaluation: mean merged-run
# length (lanes) above which packing P segments per kernel step beats
# plain whole-tile streaming.  Measured boundary: uniform 3D 256K
# (~160 lanes/run) wins 22%, two-blob collapsed (~50) loses 30% — a
# run shorter than ~a segment makes DMA count ~= run count either way,
# so packing only adds per-copy overhead.  See _evaluate_pallas_runs.
SEG_PACK_MIN_RUN_LANES = 112.0


def _expand_runs_tiles(runs: jax.Array, k_tile: int, t_cap: int):
    """Merged body runs -> per-group direct k-tile table for the
    gather-free runs evaluator (ops/list_eval.list_eval_runs).

    Each run [start, start+count) is rounded DOWN to a 128-aligned base
    (Mosaic can only slice the lane dimension of the tiled sorted table
    at provably-128-aligned dynamic offsets) and becomes
    ceil((start%128 + count)/k_tile) tiles of
    (aligned start, first valid lane, one-past-last valid lane); the
    kernel DMAs each tile directly from the [8, N] transposed sorted
    table and masks lanes outside [lo, hi).  Same prefix-sum +
    scatter-mark + cummax machinery as the superblock expansion
    (ops/experiments.expand_runs_superblocks), with per-run offsets
    clamped so an overflowing group never spills into its neighbour.

    runs: [G, R, 2] (start, count) zero-count padded.  Returns
    (tiles [G, 3, T] int32 rows [aligned tile start, lo, hi],
     n_tiles [G] int32 clamped to T, overflow [G] bool).
    """
    g, r, _ = runs.shape
    starts = runs[:, :, 0]
    counts = runs[:, :, 1]
    base = starts - starts % 128  # 128-aligned DMA base per run
    span = starts - base + counts  # lanes covered from the base
    n_t = (span + k_tile - 1) // k_tile  # 0 for padded runs (count 0,
    #                                      base == start)
    total = jnp.sum(n_t, axis=1)
    offsets = jnp.cumsum(n_t, axis=1) - n_t
    valid = n_t > 0
    kidx = jax.lax.broadcasted_iota(jnp.int32, (g, r), 1)
    row0 = jnp.arange(g, dtype=jnp.int32)[:, None] * t_cap
    flat_pos = jnp.where(
        valid & (offsets < t_cap), row0 + offsets, g * t_cap
    )
    marks = jax.ops.segment_max(
        kidx.reshape(-1),
        flat_pos.reshape(-1),
        num_segments=g * t_cap,
        indices_are_sorted=False,
    ).reshape(g, t_cap)
    marks = jnp.maximum(marks, 0)
    k = jax.lax.cummax(marks, axis=1)  # run covering each tile slot
    j = jnp.arange(t_cap, dtype=jnp.int32)
    packed = jnp.stack(
        [base, starts, starts + counts, offsets], axis=-1
    ).reshape(g * r, 4)
    rows = packed[jnp.arange(g, dtype=jnp.int32)[:, None] * r + k]
    tw = j[None, :] - rows[:, :, 3]  # tile index within its run
    ts = rows[:, :, 0] + tw * k_tile  # aligned: base + multiple of 128
    lo = jnp.clip(rows[:, :, 1] - ts, 0, k_tile)  # nonzero on tile 0
    hi = jnp.clip(rows[:, :, 2] - ts, 0, k_tile)
    mask = j[None, :] < total[:, None]
    tiles = jnp.stack(
        [
            jnp.where(mask, ts, 0),
            jnp.where(mask, lo, 0),
            jnp.where(mask, hi, 0),
        ],
        axis=1,
    )  # [G, 3, T]
    return (
        tiles,
        jnp.minimum(total, t_cap).astype(jnp.int32),
        total > t_cap,
    )


def _evaluate_pallas_runs(
    positions_grouped,  # [G, S, D]
    coord_lists,  # tuple of D approx coordinate arrays [G, L]
    lm,  # [G, L] approx masses (zero-padded)
    ranges,  # [G, D_cells, 2] direct body ranges (start, count)
    sorted_coords,  # tuple of D arrays [Ns] — ALL sources, Morton order
    sorted_gm,  # [Ns]
    *,
    g_const: float,
    softening: float,
    k_tile: int,
    run_cap: int,
    t_cap: int,
    seg_pack: int = 1,
):
    """Gather-free evaluation: approx lists stream per group; direct
    sources stream straight from the transposed sorted table (see
    ops/list_eval.list_eval_runs).  ``seg_pack = P > 1`` expands runs at
    (k_tile/P)-lane segment granularity and packs P segments per kernel
    step (short-run occupancy fix, see list_eval_runs).  Returns
    (acc [G, S, D], overflow)."""
    from .experiments import merge_ranges
    from .list_eval import list_eval_runs

    f32 = positions_grouped.dtype
    dims = positions_grouped.shape[-1]
    # approx table [G, 8, A], rows [coords..., gm, 0...]
    apad = (-coord_lists[0].shape[1]) % k_tile
    cl = [
        jnp.pad(a, ((0, 0), (0, apad))) if apad else a
        for a in coord_lists
    ]
    lmp = jnp.pad(lm, ((0, 0), (0, apad))) if apad else lm
    gg = cl[0].shape[0]
    a_width = cl[0].shape[1]
    zero = jnp.zeros((gg, 1, a_width), f32)
    approx = jnp.concatenate(
        [c[:, None, :] for c in cl]
        + [(jnp.asarray(g_const, f32) * lmp)[:, None, :]]
        + [zero] * (8 - dims - 1),
        axis=1,
    )  # [G, 8, A]

    merged, ovf_m = merge_ranges(ranges, cap=run_cap)

    ns = sorted_coords[0].shape[0]
    npad = ns + k_tile  # tail pad: any tile start < ns stays in bounds
    srct = jnp.zeros((8, npad), f32)
    for d_, c in enumerate(sorted_coords):
        srct = srct.at[d_, :ns].set(c)
    srct = srct.at[dims, :ns].set(sorted_gm)
    a_lanes = jnp.sum(lmp > 0, axis=1).astype(jnp.int32)
    tgtf = positions_grouped.astype(jnp.float32)

    def _plain():
        tiles, n_tiles, ovf_t = _expand_runs_tiles(merged, k_tile, t_cap)
        lens = jnp.stack([a_lanes, n_tiles], axis=0)  # [2, G]
        acc = list_eval_runs(
            tgtf, approx, srct, tiles, lens,
            softening=float(softening), k_tile=k_tile,
        )
        return acc, ovf_t

    if seg_pack == 1:
        acc, ovf_t = _plain()
        return acc, ovf_m | ovf_t

    # segment-granular table: same expansion machinery at width
    # k_tile/P; the kernel packs P consecutive segments per step.
    # Capacity: t_cap = direct_body_cap//k_tile + 2*run_cap, so the
    # body-volume part scales by P (narrower strips) while the
    # per-run +1 slack term doesn't — keeps the SMEM table tight.
    def _packed():
        seg_cap = max(
            t_cap, (t_cap - 2 * run_cap) * seg_pack + 2 * run_cap
        )
        tiles, n_segs, ovf_t = _expand_runs_tiles(
            merged, k_tile // seg_pack, seg_cap
        )
        n_tiles = (n_segs + seg_pack - 1) // seg_pack
        lens = jnp.stack([a_lanes, n_tiles], axis=0)
        acc = list_eval_runs(
            tgtf, approx, srct, tiles, lens,
            softening=float(softening), k_tile=k_tile,
            seg_pack=seg_pack,
        )
        return acc, ovf_t

    # Runtime packing gate (the statistic is data-dependent): packing
    # pays when runs span whole segments — measured 3D 256K same
    # invocation: uniform (mean run ~160 lanes) 230.1 -> 180.2 ms/step
    # at P=4, but two-blob collapsed (mean run ~50 lanes, segments ~=
    # runs) 188.5 -> 245.5 — there the per-DMA fixed cost of P small
    # copies dominates the lanes saved.  Both branches compile once;
    # XLA executes one.
    counts = merged[:, :, 1]
    tot = jnp.sum(counts)
    n_runs = jnp.maximum(jnp.sum(counts > 0), 1)
    mean_len = tot.astype(jnp.float32) / n_runs.astype(jnp.float32)
    acc, ovf_t = jax.lax.cond(
        mean_len >= SEG_PACK_MIN_RUN_LANES,
        _packed,
        _plain,
    )
    return acc, ovf_m | ovf_t


def _evaluate_pallas_runs_split(
    positions_grouped,  # [G, S, D]
    coord_lists,  # tuple of D approx coordinate arrays [G, L]
    lm,  # [G, L] approx masses (zero-padded)
    ranges,  # [G, D_cells, 2] direct body ranges (start, count)
    quarters,  # dict from _collect_lists(quarter_bits=True):
    #            bits [G, D_cells] per-quarter theta-fail mask,
    #            com (D arrays [G, D_cells]), mass [G, D_cells]
    sorted_coords,  # tuple of D arrays [Ns]
    sorted_gm,  # [Ns]
    *,
    g_const: float,
    softening: float,
    k_tile: int,
    run_cap: int,
    t_cap: int,
):
    """Quarter-split gather-free evaluation (see list_eval_runs_split).

    Per quarter q of each group: direct ranges are the group's direct
    cells whose per-quarter theta bit q is set (counts zeroed otherwise
    — merge_ranges skips empty entries); the remaining group-direct
    cells enter the extension table as COMs with a per-quarter use mask
    packed into the 8-row layout's spare rows.  Returns
    (acc [G, S, D], overflow)."""
    from .experiments import merge_ranges
    from .list_eval import list_eval_runs_split

    f32 = positions_grouped.dtype
    dims = positions_grouped.shape[-1]
    apad = (-coord_lists[0].shape[1]) % k_tile
    cl = [
        jnp.pad(a, ((0, 0), (0, apad))) if apad else a
        for a in coord_lists
    ]
    lmp = jnp.pad(lm, ((0, 0), (0, apad))) if apad else lm
    gg = cl[0].shape[0]
    a_width = cl[0].shape[1]
    zero = jnp.zeros((gg, 1, a_width), f32)
    approx = jnp.concatenate(
        [c[:, None, :] for c in cl]
        + [(jnp.asarray(g_const, f32) * lmp)[:, None, :]]
        + [zero] * (8 - dims - 1),
        axis=1,
    )  # [G, 8, A]

    # per-QUARTER compacted extension tables [4G, 8, E]: rows
    # [coords..., gm, 0...].  Quarter q uses a group-direct cell's COM
    # iff its own theta passes (use = direct-for-some-quarter AND NOT
    # direct-for-q); a stable sort packs exactly those cells into the
    # prefix, so the kernel streams ceil(used_q / k_tile) tiles — the
    # occupancy-pruned e_t PERF.md round 3 identified — instead of the
    # whole group-direct union with a mask.  Cells needed direct by
    # EVERY quarter appear in no table (zero used entries).
    bits = quarters["bits"]  # [G, E]
    dc = ranges[:, :, 1]
    e_raw = bits.shape[1]
    epad = (-e_raw) % k_tile
    gm_all = jnp.asarray(g_const, f32) * quarters["mass"]  # [G, E]
    ext_q = []
    elen_q = []
    for q in range(4):
        use = (dc > 0) & (((bits >> q) & 1) == 0)  # [G, E] bool
        # ONE variadic key-value sort per quarter: the COM/gm payloads
        # ride the sort itself.  The obvious argsort + take_along_axis
        # spelling costs ~41 ms/step at 3D 64K on TPU (the 20 per-row
        # gathers, measured via the zeroext/nosort bisect, PERF.md
        # round 4) — the fused variadic sort does the same compaction
        # for ~1 ms
        sorted_ops = jax.lax.sort(
            (~use,)
            + tuple(quarters["com"])
            + (jnp.where(use, gm_all, jnp.asarray(0.0, f32)),),
            dimension=1,
            num_keys=1,
            is_stable=True,
        )
        rows = [c[:, None, :] for c in sorted_ops[1:]]
        rows.append(jnp.zeros((gg, 8 - dims - 1, e_raw), f32))
        ext_q.append(jnp.concatenate(rows, axis=1))  # [G, 8, E_raw]
        elen_q.append(jnp.sum(use, axis=1).astype(jnp.int32))  # [G]
    ext = jnp.stack(ext_q, axis=1).reshape(4 * gg, 8, e_raw)
    if epad:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, epad)))

    # per-quarter direct ranges: zero the count where the quarter's
    # theta passes (the cell went to its extension section instead)
    rq = jnp.broadcast_to(
        ranges[:, None, :, :], (gg, 4, ranges.shape[1], 2)
    )
    qsel = (
        (bits[:, None, :] >> jnp.arange(4, dtype=jnp.int32)[None, :, None])
        & 1
    ) > 0  # [G, 4, E]
    rq = jnp.concatenate(
        [
            rq[..., 0:1],
            jnp.where(qsel, rq[..., 1], 0)[..., None],
        ],
        axis=-1,
    ).reshape(4 * gg, ranges.shape[1], 2)

    merged, ovf_m = merge_ranges(rq, cap=run_cap)
    tiles, n_tiles, ovf_t = _expand_runs_tiles(merged, k_tile, t_cap)

    ns = sorted_coords[0].shape[0]
    npad = ns + k_tile
    srct = jnp.zeros((8, npad), f32)
    for d_, c in enumerate(sorted_coords):
        srct = srct.at[d_, :ns].set(c)
    srct = srct.at[dims, :ns].set(sorted_gm)

    alen = jnp.sum(lmp > 0, axis=1).astype(jnp.int32)  # [G]
    # per-quarter occupied extension prefix (i = 4g + q ordering, same
    # as the tile table's reshape)
    elen = jnp.stack(elen_q, axis=1).reshape(-1)  # [4G]
    lens = jnp.stack(
        [jnp.repeat(alen, 4), elen, n_tiles], axis=0
    )  # [3, 4G]
    acc = list_eval_runs_split(
        positions_grouped.astype(jnp.float32),
        approx,
        ext,
        srct,
        tiles,
        lens,
        softening=float(softening),
        k_tile=k_tile,
    )
    return acc, jnp.reshape(ovf_m | ovf_t, (gg, 4)).any(axis=1)


def _expand_ranges_superblocks(
    ranges: jax.Array,  # [G, D, 2] (start, count)
    direct_cell_max: int,
    sb_cap: int,
):
    """Expand direct cell ranges to a compact per-group *superblock* list.

    Direct sources are gathered eight bodies at a time: a packed 24-wide
    row costs the same as a 1-wide row on TPU (latency-bound, see PERF.md),
    so fetching 8-body superblocks cuts the dominant gather volume ~8x.
    Each range [start, start+count) covers at most
    ceil((count + SB - 1) / SB) + 1 superblocks.

    Returns (sb_idx [G, C], lane lo [G, C], lane hi [G, C], overflow [G]);
    invalid entries have sb_idx == -1.  Per-lane masking against
    [lo, hi) happens in the evaluator (superblocks may contain bodies
    outside the range; ranges are disjoint so nothing double-counts).
    """
    g, d, _ = ranges.shape
    t_sb = (direct_cell_max + 2 * (_SB - 1)) // _SB + 1
    starts = ranges[:, :, 0]
    counts = ranges[:, :, 1]
    ends = starts + counts
    first = starts >> 3
    last = (ends - 1) >> 3  # arithmetic shift: count==0 -> last < first
    offs = jnp.arange(t_sb, dtype=jnp.int32)
    sb = (first[:, :, None] + offs).reshape(g, d * t_sb)
    mask = (offs[None, None, :] <= (last - first)[:, :, None]).reshape(
        g, d * t_sb
    )
    lo = jnp.broadcast_to(starts[:, :, None], (g, d, t_sb)).reshape(g, -1)
    hi = jnp.broadcast_to(ends[:, :, None], (g, d, t_sb)).reshape(g, -1)
    (sb_c, lo_c, hi_c), overflow = _sort_compact(
        mask,
        [jnp.where(mask, sb, -1), lo, jnp.where(mask, hi, 0)],
        sb_cap,
    )
    return sb_c, lo_c, hi_c, overflow


def _evaluate(
    positions_grouped: jax.Array,  # [G, S, 2] group member positions
    cells: jax.Array,  # [G, L, 3] approx list (x, y, mass)
    direct_sb,  # (sb_idx [G, C], lo [G, C], hi [G, C]) superblock list
    sorted_x: jax.Array,  # [Ns] Morton-sorted source x
    sorted_y: jax.Array,  # [Ns]
    sorted_gm: jax.Array,  # [Ns] g * mass
    *,
    g_const: float,
    softening: float,
    group_chunk: int,
):
    """Dense body x (approx cells + direct superblocks), chunked over
    groups.

    Direct sources are raw sorted body values (bit-exact), so a member
    body meeting itself is excluded by the d2 > 0 guard, exactly like the
    all-pairs kernel.  Superblock lanes outside the emitting range's
    [lo, hi) are masked (the superblock may span range boundaries).
    """
    f32 = positions_grouped.dtype
    eps = jnp.asarray(softening, f32)
    sb_idx_all, lo_all, hi_all = direct_sb

    # pack 8 bodies per row: [Nsb, 24] = [x*8, y*8, gm*8]; gm padding is 0
    ns = sorted_x.shape[0]
    ns_pad = ((ns + _SB - 1) // _SB) * _SB
    pad = ns_pad - ns

    def pad1(a, value=0.0):
        return jnp.concatenate(
            [a, jnp.full((pad,), value, a.dtype)]
        ) if pad else a

    sb_packed = jnp.concatenate(
        [
            pad1(sorted_x).reshape(-1, _SB),
            pad1(sorted_y).reshape(-1, _SB),
            pad1(sorted_gm).reshape(-1, _SB),
        ],
        axis=1,
    )  # [Nsb, 24]
    lane = jnp.arange(_SB, dtype=jnp.int32)

    def chunk_fn(args):
        p, c, sbi, lo, hi = args  # [C,S,2], [C,L,3], [C,B], [C,B], [C,B]
        bx = p[:, :, 0:1]  # [C, S, 1]
        by = p[:, :, 1:2]

        def accum(sx, sy, sw):
            # sx/sy/sw: [C, 1, K] source coords and premultiplied weights
            dx = sx - bx  # [C, S, K]
            dy = sy - by
            d2 = dx * dx + dy * dy
            valid = (d2 > 0.0) & (sw > 0.0)
            d = jnp.sqrt(d2) + eps
            w = jnp.where(
                valid, sw / (jnp.where(valid, d2, 1.0) * d), 0.0
            )
            return jnp.sum(w * dx, axis=-1), jnp.sum(w * dy, axis=-1)

        # approx cells
        ax, ay = accum(
            c[:, None, :, 0],
            c[:, None, :, 1],
            jnp.asarray(g_const, f32) * c[:, None, :, 2],
        )

        # direct superblocks: one 24-wide row gather per 8 bodies
        dmask = sbi >= 0
        rows = sb_packed[jnp.where(dmask, sbi, 0)]  # [C, B, 24]
        body_id = (
            jnp.where(dmask, sbi, 0)[:, :, None] * _SB + lane
        )  # [C, B, 8]
        lane_ok = (
            dmask[:, :, None]
            & (body_id >= lo[:, :, None])
            & (body_id < hi[:, :, None])
        )
        cb = sbi.shape[0]
        width = sbi.shape[1] * _SB
        dxs = rows[:, :, 0:_SB].reshape(cb, 1, width)
        dys = rows[:, :, _SB : 2 * _SB].reshape(cb, 1, width)
        dws = jnp.where(lane_ok, rows[:, :, 2 * _SB :], 0.0).reshape(
            cb, 1, width
        )
        ax2, ay2 = accum(dxs, dys, dws)
        return ax + ax2, ay + ay2

    n_groups = positions_grouped.shape[0]
    chunk = min(group_chunk, n_groups)
    gpad = (-n_groups) % chunk
    if gpad:
        positions_grouped = jnp.pad(
            positions_grouped, ((0, gpad), (0, 0), (0, 0))
        )
        cells = jnp.pad(cells, ((0, gpad), (0, 0), (0, 0)))
        sb_idx_all = jnp.pad(
            sb_idx_all, ((0, gpad), (0, 0)), constant_values=-1
        )
        lo_all = jnp.pad(lo_all, ((0, gpad), (0, 0)))
        hi_all = jnp.pad(hi_all, ((0, gpad), (0, 0)))
    ax, ay = jax.lax.map(
        chunk_fn,
        (
            positions_grouped.reshape(
                -1, chunk, *positions_grouped.shape[1:]
            ),
            cells.reshape(-1, chunk, *cells.shape[1:]),
            sb_idx_all.reshape(-1, chunk, sb_idx_all.shape[1]),
            lo_all.reshape(-1, chunk, lo_all.shape[1]),
            hi_all.reshape(-1, chunk, hi_all.shape[1]),
        ),
    )
    ax = ax.reshape(-1, positions_grouped.shape[1])[:n_groups]
    ay = ay.reshape(-1, positions_grouped.shape[1])[:n_groups]
    return ax, ay


@functools.partial(
    jax.jit,
    static_argnames=(
        "g",
        "theta",
        "max_depth",
        "softening",
        "group_size",
        "frontier_cap",
        "list_cap",
        "direct_cap",
        "direct_cell_max",
        "direct_body_cap",
        "group_chunk",
        "return_diagnostics",
        "use_pallas",
        "n_sub",
        "compensated",
        "eval_dynamic",
        "eval_k_tile",
        "eval_mode",
        "run_cap",
        "split_eval",
        "seg_pack",
    ),
)
def bh_accelerations_grouped(
    positions: jax.Array,
    masses: jax.Array,
    *,
    g: float,
    theta: float = THETA_DEFAULT,
    max_depth: int = MAX_DEPTH_DEFAULT,
    softening: float = BH_SOFTENING,
    group_size: int | None = None,
    frontier_cap: int | None = None,
    list_cap: int | None = None,
    direct_cap: int | None = None,
    direct_cell_max: int = 32,
    direct_body_cap: int | None = None,
    group_chunk: int = 32,
    return_diagnostics: bool = False,
    use_pallas: bool | None = None,
    n_sub: int | None = None,
    compensated: bool = False,
    eval_dynamic: bool = True,
    eval_k_tile: int | None = None,
    eval_mode: str | None = None,
    run_cap: int | None = None,
    split_eval: bool | None = None,
    seg_pack: int | None = None,
):
    """Grouped Barnes-Hut accelerations [N, 2] (+ overflow [N] optional).

    ``None`` caps resolve from :func:`cap_defaults` (measured-demand
    defaults with ~2x headroom; the overflow flag guards the rest)."""
    f32 = positions.dtype
    tree = build_quadtree(positions, masses, max_depth=max_depth)
    # source bodies in Morton order (what direct ranges index into); ONE
    # packed [N, 4] row gather instead of separate position/mass gathers
    # (row gathers are latency-bound: width is free, rows are not)
    src_order = jnp.argsort(tree.codes)
    packed = jnp.concatenate(
        [positions, masses[:, None], jnp.zeros_like(masses)[:, None]],
        axis=1,
    )
    psort = packed[src_order]
    return grouped_eval(
        positions,
        tree,
        sorted_x=psort[:, 0],
        sorted_y=psort[:, 1],
        sorted_gm=jnp.asarray(g, f32) * psort[:, 2],
        g=g,
        theta=theta,
        softening=softening,
        group_size=group_size,
        frontier_cap=frontier_cap,
        list_cap=list_cap,
        direct_cap=direct_cap,
        direct_cell_max=direct_cell_max,
        direct_body_cap=direct_body_cap,
        group_chunk=group_chunk,
        return_diagnostics=return_diagnostics,
        target_codes=tree.codes,
        target_sorted=psort[:, 0:2],
        target_order=src_order,
        use_pallas=use_pallas,
        n_sub=n_sub,
        compensated=compensated,
        eval_dynamic=eval_dynamic,
        eval_k_tile=eval_k_tile,
        eval_mode=eval_mode,
        run_cap=run_cap,
        split_eval=split_eval,
        seg_pack=seg_pack,
    )


def grouped_eval(
    target_positions: jax.Array,  # [Nt, 2] bodies to accelerate
    tree: Quadtree,
    *,
    sorted_x: jax.Array,  # [Ns] source bodies in Morton order
    sorted_y: jax.Array,
    sorted_gm: jax.Array,  # [Ns] g * mass in the same order
    g: float,
    theta: float = THETA_DEFAULT,
    softening: float = BH_SOFTENING,
    group_size: int | None = None,
    frontier_cap: int | None = None,
    list_cap: int | None = None,
    direct_cap: int | None = None,
    direct_cell_max: int = 32,
    direct_body_cap: int | None = None,
    group_chunk: int = 32,
    return_diagnostics: bool = False,
    target_codes: jax.Array | None = None,
    target_sorted: jax.Array | None = None,
    target_order: jax.Array | None = None,
    use_pallas: bool | None = None,
    n_sub: int | None = None,
    compensated: bool = False,
    eval_dynamic: bool = True,
    eval_k_tile: int | None = None,
    eval_mode: str | None = None,
    run_cap: int | None = None,
    split_eval: bool | None = None,
    seg_pack: int | None = None,
    window_cells=None,
    range_offset=None,
    n_sources_hint: int | None = None,
):
    """Grouped evaluation of arbitrary targets against a prebuilt tree.

    ``eval_mode``: None resolves to "runs" on TPU (or "grid" when
    ``eval_dynamic=False`` / ``compensated``); "runs" selects the
    gather-free runs evaluator (_evaluate_pallas_runs).

    ``split_eval``: None auto-enables quarter-split evaluation on the
    runs path (groups of >= 512 bodies whose sub-bbox count tiles the
    quarters) — each Morton quarter of a group evaluates only the direct
    cells its own sub-bboxes fail theta against; cells another quarter
    needs contribute as COMs through an extension section
    (_evaluate_pallas_runs_split).  Cuts the union factor of the group
    near field.  False forces the whole-group evaluator.

    ``sorted_*`` must be ALL source bodies in global Morton order (direct
    ranges index into them; the tree's leaf counts define the ranges).
    Targets may be any subset of the sources (multi-chip: each device
    passes its local shard as targets against the gathered global
    sources).  Self-exclusion needs no indices: a target meeting its own
    singleton cell or its own entry in a direct range sees a bit-equal
    position and is dropped by the d2 > 0 guard.

    Sharded-source mode (parallel.make_dp_barnes_hut_sharded_step):
    ``sorted_*`` may instead hold only a Morton-contiguous *window* of
    the global sorted order — then ``window_cells=(c_lo, c_hi)`` (leaf
    cells the window fully covers) gates direct emission to resident
    cells (out-of-window close cells open to max-depth aggregates, the
    reference DFS's own close-cell treatment), ``range_offset`` is the
    global index of the window array's first slot, and
    ``n_sources_hint`` keys the cap calibration to the GLOBAL body
    count (caps scale with density, which the window alone understates).
    """
    n = target_positions.shape[0]
    f32 = target_positions.dtype

    if group_size is None:
        group_size = DEFAULT_GROUP_SIZE
    # caps scale with the SOURCE cloud size (density sets demand)
    defaults = cap_defaults(
        group_size,
        n_sources_hint if n_sources_hint else sorted_x.shape[0],
    )
    frontier_cap = frontier_cap or defaults["frontier_cap"]
    list_cap = list_cap or defaults["list_cap"]
    direct_cap = direct_cap or defaults["direct_cap"]
    direct_body_cap = direct_body_cap or defaults["direct_body_cap"]

    if target_codes is None:
        target_codes = morton_codes(
            target_positions, tree.bounds, tree.max_depth
        )

    # sort targets by Morton code so groups are spatially compact; pad to
    # a group multiple with copies of the last body (tight trailing bbox;
    # padded results are sliced off).  Callers that already hold the
    # sorted targets (bh_accelerations_grouped: targets == sources) pass
    # them in to skip a redundant 64K-row gather.
    order = jnp.argsort(target_codes) if target_order is None else target_order
    gs = min(group_size, max(n, 1))
    n_pad = ((n + gs - 1) // gs) * gs
    tsort = (
        target_positions[order] if target_sorted is None else target_sorted
    )
    tsort = jnp.concatenate(
        [tsort, jnp.broadcast_to(tsort[-1], (n_pad - n, 2))], axis=0
    )
    pg = tsort.reshape(-1, gs, 2)  # [G, S, 2]

    # Q sub-bboxes per group over slices of the sorted run (tight even
    # when the run straddles a Morton seam; see _collect_lists).  Bigger
    # groups need more sub-boxes to keep d_min tight (the union bbox of a
    # 2048-body Morton run is a large fraction of the domain).
    if n_sub is None:
        n_sub = max(4, gs // 128)
    if gs % n_sub:
        n_sub = 1
    sub = pg.reshape(pg.shape[0], n_sub, gs // n_sub, 2)
    bbox = (
        jnp.min(sub[..., 0], axis=2),
        jnp.max(sub[..., 0], axis=2),
        jnp.min(sub[..., 1], axis=2),
        jnp.max(sub[..., 1], axis=2),
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if split_eval is None:
        # quarter-split needs runs mode, quarterable groups, and sub-
        # bboxes that tile the quarters; its union-factor win needs
        # groups big enough that quarters are still spatially coherent
        split_eval = (
            use_pallas
            and eval_mode in (None, "runs")
            and not compensated
            and eval_dynamic
            and gs % 4 == 0
            and gs >= 512
            and n_sub % 4 == 0
            # the union-factor cut only pays off against the huge
            # near fields of ~1M-body clouds (same-session A/Bs, PERF.md
            # round 4): 3D 1M 1,086.9 -> 994.7 ms/step with the
            # variadic-sort compacted lanes, but 64K 15.2 -> 18.5, 256K
            # 238.2 -> 283.9 and even 512K (dcm=128's lower edge)
            # 408.9 -> 429.1 — the 4x grid overhead beats the saving
            # below ~3/4M bodies even with zero-cost extension tables
            and direct_cell_max >= 128
            and (n_sources_hint or sorted_x.shape[0]) >= 768 * 1024
        )
    elif split_eval and (gs % 4 or n_sub % 4):
        raise ValueError(
            "split_eval=True requires group_size and n_sub divisible "
            f"by 4 (got {gs}, {n_sub})"
        )
    collected = _collect_lists(
        bbox,
        tree,
        theta=theta,
        softening=softening,
        frontier_caps=frontier_schedule(
            frontier_cap,
            tree.max_depth,
            n_sources_hint if n_sources_hint else sorted_x.shape[0],
        ),
        list_cap=list_cap,
        direct_cap=direct_cap,
        direct_cell_max=direct_cell_max,
        window_cells=window_cells,
        quarter_bits=split_eval,
    )
    (lx, ly, lm), ranges, overflow_g = collected[0:3]
    quarters = collected[3] if split_eval else None
    if range_offset is not None:
        # window-local body indices (the sorted_* arrays start at global
        # slot ``range_offset``); in-window ranges stay non-negative
        ranges = ranges.at[:, :, 0].set(
            jnp.where(
                ranges[:, :, 1] > 0, ranges[:, :, 0] - range_offset, 0
            )
        )
    if eval_mode is None:
        # runs (gather-free) is the measured default winner on TPU at
        # every 2D scale (PERF.md round-3 table); the legacy
        # eval_dynamic=False knob still selects the grid kernel.
        if not eval_dynamic:
            eval_mode = "grid"
        else:
            eval_mode = "runs" if use_pallas else "dynamic"
    if split_eval and eval_mode != "runs":
        split_eval = False
        quarters = None
    if compensated:
        eval_mode = "grid"  # the Kahan path lives in the grid kernel
    if eval_k_tile is None:
        # runs: small tiles cut the ~k/2-per-run padding of the few-run
        # 2D near fields; grid/dynamic: 2048 is the VMEM-budget maximum
        eval_k_tile = 256 if eval_mode == "runs" else 2048
    if eval_mode == "runs":
        from .list_eval import runs_k_max

        eval_k_tile = min(eval_k_tile, runs_k_max())

    if use_pallas and eval_mode == "runs":
        # Gather-free direct path: interval-union the per-cell ranges
        # into Morton runs and stream their k-tiles straight from the
        # transposed sorted table (no superblock gather, no padded
        # per-group source materialisation) — see list_eval_runs.
        rc = run_cap or defaults["run_cap"]
        if seg_pack is None:
            # 2D near fields union into FEW LONG runs (merged-run
            # calibration: 39-166 runs against ~12K-body near fields),
            # so plain 256-lane tiles are already well occupied;
            # packing stays off by default (it is a short-run fix —
            # see the 3D resolution, ops/bh3d.grouped_eval_3d)
            env = os.environ.get("NBODY_SEG_PACK")
            seg_pack = int(env) if env is not None else 1
        if seg_pack > 1 and eval_k_tile % (128 * seg_pack):
            seg_pack = 1
        if split_eval:
            acc_r, ovf_e = _evaluate_pallas_runs_split(
                pg,
                (lx, ly),
                lm,
                ranges,
                quarters,
                (sorted_x, sorted_y),
                sorted_gm,
                g_const=g,
                softening=softening,
                k_tile=eval_k_tile,
                run_cap=rc,
                t_cap=direct_body_cap // eval_k_tile + 2 * rc,
            )
        else:
            acc_r, ovf_e = _evaluate_pallas_runs(
                pg,
                (lx, ly),
                lm,
                ranges,
                (sorted_x, sorted_y),
                sorted_gm,
                g_const=g,
                softening=softening,
                k_tile=eval_k_tile,
                run_cap=rc,
                t_cap=direct_body_cap // eval_k_tile + 2 * rc,
                seg_pack=seg_pack,
            )
        overflow_g = overflow_g | ovf_e
        ax, ay = acc_r[:, :, 0], acc_r[:, :, 1]
    elif use_pallas:
        # Static per-cell superblock expansion (the grid/dynamic
        # kernels' direct path).
        sb_cap = direct_body_cap // _SB + direct_cap
        sb_idx, sb_lo, sb_hi, ovf_b = _expand_ranges_superblocks(
            ranges, direct_cell_max, sb_cap
        )
        overflow_g = overflow_g | ovf_b
        ax, ay = _evaluate_pallas(
            pg,
            (lx, ly, lm),
            (sb_idx, sb_lo, sb_hi),
            sorted_x,
            sorted_y,
            sorted_gm,
            g_const=g,
            softening=softening,
            compensated=compensated,
            dynamic=(eval_mode == "dynamic"),
            k_tile=eval_k_tile,
        )
    else:
        sb_cap = direct_body_cap // _SB + direct_cap
        sb_idx, sb_lo, sb_hi, ovf_b = _expand_ranges_superblocks(
            ranges, direct_cell_max, sb_cap
        )
        overflow_g = overflow_g | ovf_b
        cells = jnp.stack([lx, ly, lm], axis=-1)  # [G, L, 3]
        ax, ay = _evaluate(
            pg,
            cells,
            (sb_idx, sb_lo, sb_hi),
            sorted_x,
            sorted_y,
            sorted_gm,
            g_const=g,
            softening=softening,
            group_chunk=group_chunk,
        )

    # un-sort by SORTING on the permutation: ``order`` is a permutation
    # of 0..n-1, so sorting (order, values) by order restores original
    # body order on the fast bitonic path — the scatter formulation
    # (acc.at[order].set) serializes per row (~1.1 ms at 64K)
    axs = ax.reshape(-1)[:n]
    ays = ay.reshape(-1)[:n]
    if return_diagnostics:
        ovf_sorted = jnp.repeat(overflow_g, gs)[:n]
        _, ax_o, ay_o, ovf = jax.lax.sort(
            [order, axs, ays, ovf_sorted.astype(jnp.int32)],
            dimension=0, num_keys=1, is_stable=False,
        )
        return jnp.stack([ax_o, ay_o], axis=-1), ovf.astype(bool)
    _, ax_o, ay_o = jax.lax.sort(
        [order, axs, ays], dimension=0, num_keys=1, is_stable=False
    )
    return jnp.stack([ax_o, ay_o], axis=-1)
