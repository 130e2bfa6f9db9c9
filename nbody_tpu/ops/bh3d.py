"""Group-based Barnes-Hut in 3D: Morton-sorted groups over the octree.

The 3D generalisation the reference's report names (octree / ``N_DIM=3``,
project_report.pdf p.8) but never implements (the shipped code is 2D-only,
project.cu:28; ``plot_3d.py`` is non-functional).  Same TPU-native design
as the 2D grouped engine (ops/bh_grouped.py):

1. sort bodies by 3D Morton code — consecutive bodies are spatially
   compact;
2. fixed-size groups with Q sub-bboxes (static shapes);
3. one conservative dual traversal per group over the dense octree
   pyramid: accept cell iff size_l / d_min < theta with d_min the
   group-bbox -> cell-COM distance lower bound (only ever opens MORE
   than per-body BH — at least as accurate);
4. close multi-body cells are emitted as Morton-contiguous body *ranges*
   (exact pairwise resolution via 8-body superblock gathers);
5. evaluation is dense bodies x list in the streaming Pallas kernel
   (ops/list_eval with dims=3).

Self-exclusion is index-free: singleton cells and direct-range bodies
carry bit-exact positions, so a body meeting itself has d2 == 0 exactly
and the d2 > 0 guard drops it (see ops/tree3d.leaf_raw_3d).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import BH_SOFTENING, MASS_SKIP_THRESHOLD, THETA_DEFAULT
from .bh_grouped import (
    _SB,
    _evaluate_pallas_runs,
    _evaluate_pallas_runs_split,
    _expand_ranges_superblocks,
    _pow2_ceil,
    _sort_compact,
)
from .tree3d import (
    R3_CNT,
    R3_M,
    R3_MX,
    R3_MY,
    R3_MZ,
    R3_OCC,
    R3_SX,
    R3_SY,
    R3_SZ,
    Octree,
    build_octree,
    default_max_depth3,
    level_cell_size_3d,
    morton_codes_3d,
)


def frontier_peak_3d(n_bodies: int) -> int:
    """3D cap scale: demand grows ~N^(2/3) (the surface of the opened
    region is 2D in a 3D domain, vs ~sqrt(N) in 2D).  Verified against
    measured per-group demand (gs=2048, theta=0.5, default depth):

    | N    | dist    | approx | direct cells | direct bodies | frontier |
    |------|---------|--------|--------------|---------------|----------|
    | 64K  | uniform | 1,470  | 2,782        | 39,601        | 2,356    |
    | 64K  | 2 blobs | 5,109  | 1,745        | 21,932        | 4,753    |
    | 256K | uniform | 4,201  | 7,923        | 100,021       | —        |
    | 256K | 2 blobs | 18,529 | 11,379       | 147,548       | —        |

    (ratios 64K->256K ~ 2.5-2.9 ~ 4^(2/3)); the overflow flag guards
    distributions that beat the headroom.  The 32K clamp engages at
    N ~ 1M (a 16K clamp left 5.3% of bodies overflowing there); the
    chunked evaluator (_evaluate_pallas_3d) keeps the wide source
    tables within HBM.

    The 4x multiplier (was 3x through round 4) exists for the md
    boundary band: at N in (92K, 143K] the default tree deepens to
    md=7 (``default_max_depth3`` crosses at 64K+1) while 3*N^(2/3)
    still rounded to the 64K-tier 8192, and a uniform 128K cloud
    persistently overflowed BOTH the frontier schedule and the list
    caps on one tail group — every contract step paid the 4x adaptive
    retry.  pow2_ceil absorbs 4x at every other scale (64K stays 8192,
    256K stays 16384, 512K/1M stay 32768); only the squeezed band
    moves to the 256K-tier caps, measured overflow-free there."""
    return min(32768, max(2048, _pow2_ceil(int(4 * n_bodies ** (2 / 3)))))


def direct_cell_max_default(n_bodies: int) -> int:
    """N-aware direct-cell threshold.  At 1M bodies the dcm=32 walk
    opens 33K-63K frontier cells per group at the deep levels (measured)
    and the frontier compaction sorts dominate the step; raising dcm
    stops the walk earlier — cells up to ``dcm`` bodies become exact
    Morton ranges instead of opening.  Measured end-to-end: at 256K
    dcm=128 LOSES (337 vs 270 ms/step — the extra direct volume and the
    wider eval grid cost more than the frontier sorts saved), so the
    switch engages at 512K+ where the dcm=32 frontier becomes untenable
    (33K-63K cells/group at 1M vs 7K/19K at dcm=128)."""
    return 32 if n_bodies < 524288 else 128


def default_group_size3(n_sources: int) -> int:
    """Morton group size for the 3D grouped engine (``group_size=None``).

    4096 in the [256K, 768K) band, 2048 elsewhere — same-invocation
    slope A/Bs (PERF.md round 5): 256K uniform 151.0 -> 111.3 ms/step
    (1.36x) and blobs 149.2 -> 100.1, 512K uniform 378.3 -> 356.1;
    halving the group count halves the per-group window/list work the
    dense collector and the runs evaluator pay, while per-group list
    demand stays nearly flat (theta + geometry set it, the round-2
    observation that moved 512 -> 2048).  1M measured 886.6 -> 1037.9
    — a LOSS (the dcm=128 + quarter-split regime's fat direct sections
    outgrow what the fewer, wider groups save), so the band closes at
    the ~768K quarter-split/auto-split boundary."""
    return 4096 if 262144 <= n_sources < 786432 else 2048


def cap_defaults_3d(n_bodies: int) -> dict:
    peak = frontier_peak_3d(n_bodies)
    dcm = direct_cell_max_default(n_bodies)
    if dcm >= 128:
        # The dcm=128 walk terminates far shallower than the dcm=32
        # calibration the peak-scaled caps were sized for: scripts/
        # demand.py measures approx <= 10,467 and direct cells <= 5,598
        # per group across 512K/1M x uniform/blobs — the old 5/4*peak
        # (40,960) and 3/4*peak (24,576) caps were many-x oversized and
        # the final compaction sorts + the [G, 8, list_cap] approx
        # table (671 MB/step of HBM at 1M) paid for it.  7/16*peak
        # (14,336 at 1M) / peak//4 keep >= 1.37x / 1.46x headroom,
        # multiple-of-2048 list width for the Pallas section offset;
        # the overflow flag guards anything beyond.
        list_cap = max(4096, -(-(7 * peak // 16) // 2048) * 2048)
        direct_cap = max(2048, peak // 4)
    else:
        # 5/4*peak covers the collapsed-state approx hump (1.2x peak
        # measured); rounded to a multiple of 2048 so the Pallas section
        # offset tiles at the full k_tile
        list_cap = max(4096, -(-(5 * peak // 4) // 2048) * 2048)
        direct_cap = max(2048, 3 * peak // 4)
    return dict(
        list_cap=list_cap,
        direct_cap=direct_cap,
        # dcm=128 direct sections run to ~535K bodies/group at 1M
        # collapsed (measured); 20*peak = 655,360 there
        direct_body_cap=max(32768, (12 if dcm <= 32 else 20) * peak),
        frontier_cap=peak,
        run_cap=run_cap_default_3d(n_bodies),
    )


def run_cap_default_3d(n_bodies: int) -> int:
    """Merged-run cap for the runs evaluator (max contiguous Morton
    runs per group after interval-union, bh_grouped.merge_ranges).

    scripts/demand.py merged-run calibration (gs=2048, theta=0.5,
    uniform / two-blob collapsed): 64K 145/95, 256K 315/516,
    512K (dcm=128) 257/377, 1M (dcm=128) 291/240.  dcm=32 demand grows
    ~linearly with N and blobs dominate; the 256K blob peak (516)
    overflowed the old flat 512 by one group.  Linear-in-N with
    >=1.45x headroom, 128-multiple (the merged-ranges sort width stays
    small and static), floor 256.  The dcm=128 walk terminates at
    fatter cells that union into fewer runs and demand plateaus
    (512K peak 377); flat 640 keeps >=1.7x headroom and only widens
    the XLA-side merge intermediate, never the Pallas inner loop."""
    if direct_cell_max_default(n_bodies) >= 128:
        return 640
    return max(256, -(-(768 * n_bodies // 262144) // 128) * 128)


def frontier_schedule_3d(
    peak: int, max_depth: int, n_bodies: int
) -> Tuple[int, ...]:
    """Per-level frontier capacities for the octree walk.

    Two regimes, both measured (overflow-free on uniform + two-blob
    collapsed states at every listed scale):

    * N < 512K (dcm=32): the 2D-style lstar hump model — demand peaks
      where bodies/cell ~ 16 and has a max-depth tail for collapsed
      states.
    * N >= 512K (dcm=128): the walk terminates where bodies/cell ~ dcm
      — l_t = ceil(log8(N/dcm)).  scripts/demand.py calibration
      (uniform + two-blob collapsed, fmul=2):

        1M uniform  [8, 64, 512, 1650, 8048, 0, 0, (md)]
        1M blobs    [8, 39, 108, 215, 965, 3672, 9608, (md)]
        512K uniform [8, 64, 512, 1650, 9160, 0, 0]
        512K blobs   [8, 31, 67, 267, 1139, 4216, 9960]

      The uniform spike enters l_t (and straddles l_t+1 when N/dcm is
      an exact power of 8 — 512K's l5 9,160 overflowed the round-3
      single-level ramp); collapsed states move the spike toward
      max_depth but SMALLER (dense matter occupies few cells).  Caps:
      3/8*peak at l_t and l_t+1 (1.3-1.5x measured), peak//4 on deeper
      non-terminal levels (1.9x+), peak//2 at max_depth (1.6x), peak//8
      above the zone (2.5x)."""
    import math

    hump = direct_cell_max_default(n_bodies) < 128
    # Every level from floor(l*) down gets the full peak: the hump can
    # only shift DEEPER mid-run (clustering / outlier-driven root-bbox
    # expansion raise the core's per-cell density — the 2D engine's
    # measured midsize-N failure, see bh_grouped.frontier_schedule).
    # The overflow flag and the run loop's per-step warning guard
    # pathological states in both regimes.
    lf = math.log(max(n_bodies, 128) / 16, 8)
    lo_star = min(max_depth, max(3, math.floor(lf)))
    dcm = direct_cell_max_default(n_bodies)
    l_t = min(
        max_depth, max(3, math.ceil(math.log(max(n_bodies // dcm, 8), 8)))
    )
    shape = []
    for level in range(max_depth + 1):
        if level <= 2:
            c = 8**level
        elif level == max_depth:
            c = peak if hump else peak // 2
        elif not hump:
            if level in (l_t, l_t + 1):
                c = 3 * peak // 8
            elif level > l_t + 1:
                c = peak // 4  # collapsed-state deep tail
            else:
                c = peak // 8
        elif level >= lo_star:
            c = peak
        else:
            c = peak >> min(lo_star - level, 3)
        shape.append(int(min(c, peak, 8**level)))
    return tuple(shape)


def _collect_lists_3d(
    bbox,  # 6-tuple of [G, Q] arrays: x0, x1, y0, y1, z0, z1
    tree: Octree,
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
    """Per-group interaction lists via the dual cell-vs-bbox octree walk.

    Classification per frontier cell mirrors the 2D engine
    (ops/bh_grouped._collect_lists) with 8 children and 3-bit shifts:
    singletons and theta-ok / max-depth multis -> approx list; close
    small multis -> Morton body ranges; the rest open.

    Returns ((lx, ly, lz, lm) approx lists [G, L], ranges [G, D, 2],
    overflow [G] bool).  ``window_cells`` gates direct emission to the
    resident Morton window (sharded multi-chip mode — see the 2D
    mirror, ops/bh_grouped._collect_lists).

    ``return_demand=True`` appends a calibration dict (the measurements
    behind frontier_schedule_3d / cap_defaults_3d): ``frontier``
    [max_depth] max-over-groups opened-children demand entering each
    level, ``approx``/``direct`` max per-group totals — counted BEFORE
    truncation so demand above a cap stays visible, but only up to what
    the given caps let the walk reach (calibrate with generous caps;
    scripts/demand.py).
    """
    x0, x1, y0, y1, z0, z1 = bbox
    g = x0.shape[0]
    f32 = x0.dtype
    max_depth = tree.max_depth
    overflow = jnp.zeros((g,), bool)
    demand = []

    leaf_cnt = tree.leaf_counts()
    leaf_cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(leaf_cnt).astype(jnp.int32)]
    )  # [8^max_depth + 1]

    frontier = jnp.zeros((g, 1), jnp.int32)  # root
    fcap = 1

    app_x, app_y, app_z, app_m, app_mask = [], [], [], [], []
    dir_s, dir_c, dir_mask = [], [], []
    # quarter_bits payloads for split evaluation (see the 2D mirror)
    dir_b, dir_x, dir_y, dir_z, dir_m = [], [], [], [], []

    for level in range(max_depth + 1):
        is_last = level == max_depth
        fcap_l = fcap
        next_cap = (
            None if is_last else min(8 * fcap, frontier_caps[level + 1])
        )
        nf_width = (
            None
            if is_last
            else (8 * fcap if next_cap == 8 * fcap else next_cap)
        )

        def _level(frontier, level=level, is_last=is_last,
                   fcap_l=fcap_l, next_cap=next_cap):
            valid = frontier >= 0
            idx = jnp.where(valid, frontier, 0)
            rows = tree.raw[level][idx]  # [G, F, 16] — the one gather
            m = rows[..., R3_M]
            cnt = rows[..., R3_CNT]
            one = jnp.asarray(1.0, f32)
            safe = jnp.where(m > 0, m, one)
            cx = jnp.where(
                cnt == one, rows[..., R3_SX], rows[..., R3_MX] / safe
            )
            cy = jnp.where(
                cnt == one, rows[..., R3_SY], rows[..., R3_MY] / safe
            )
            cz = jnp.where(
                cnt == one, rows[..., R3_SZ], rows[..., R3_MZ] / safe
            )

            # distance from each sub-bbox to the cell COM (0 if inside)
            cxe, cye, cze = cx[:, None, :], cy[:, None, :], cz[:, None, :]
            dx = jnp.maximum(
                jnp.maximum(x0[:, :, None] - cxe, cxe - x1[:, :, None]),
                0.0,
            )  # [G, Q, F]
            dy = jnp.maximum(
                jnp.maximum(y0[:, :, None] - cye, cye - y1[:, :, None]),
                0.0,
            )
            dz = jnp.maximum(
                jnp.maximum(z0[:, :, None] - cze, cze - z1[:, :, None]),
                0.0,
            )
            d2all = dx * dx + dy * dy + dz * dz  # [G, Q, F]
            soft = jnp.asarray(softening, f32)
            # sqrt AFTER the min over sub-bboxes: bit-identical (sqrt is
            # monotone and correctly rounded per element) at 1/Q of the
            # sqrt volume — the [G, Q, F] tensors are the collect
            # phase's largest
            d_min = jnp.sqrt(jnp.min(d2all, axis=1)) + soft  # [G, F]
            size = level_cell_size_3d(tree.bounds, level).astype(f32)
            theta_ok = size < theta * d_min

            nonempty = valid & (cnt > 0) & (m > MASS_SKIP_THRESHOLD)
            single = nonempty & (cnt == one)
            multi = nonempty & (cnt > one)
            approx = single | (multi & (theta_ok | is_last))
            direct = (
                multi
                & ~theta_ok
                & (not is_last)
                & (cnt <= direct_cell_max)
            )
            if window_cells is not None:
                c_lo, c_hi = window_cells
                shift_w = 3 * (max_depth - level)
                in_win = ((idx << shift_w) >= c_lo) & (
                    ((idx + 1) << shift_w) <= c_hi + 1
                )
                direct = direct & in_win

            shift = 3 * (max_depth - level)
            outs = [
                cx, cy, cz,
                jnp.where(approx, m, 0.0),
                approx,
                idx << shift,
                jnp.where(direct, cnt.astype(jnp.int32), 0),
                direct,
            ]
            if quarter_bits:
                # per-quarter theta verdicts (quarter q = Morton sub-
                # bboxes [qQ/4, (q+1)Q/4)); direct implies >= 1 bit set
                qn = d2all.shape[1] // 4
                dq = (
                    jnp.sqrt(jnp.min(d2all.reshape(g, 4, qn, -1), axis=2))
                    + soft
                )  # [G, 4, F]
                fail_q = size >= theta * dq
                bits = jnp.sum(
                    jnp.where(
                        fail_q,
                        jnp.asarray([1, 2, 4, 8], jnp.int32)[
                            None, :, None
                        ],
                        0,
                    ),
                    axis=1,
                    dtype=jnp.int32,
                )
                outs += [
                    jnp.where(direct, bits, 0),
                    cx, cy, cz,
                    jnp.where(direct, m, 0.0),
                ]

            if is_last:
                return tuple(outs)

            open_ = multi & ~theta_ok & ~direct
            children = (
                idx[:, :, None] * 8 + jnp.arange(8, dtype=jnp.int32)
            ).reshape(g, -1)
            occ = rows[..., R3_OCC].astype(jnp.int32)
            child_bits = (
                (occ[:, :, None] >> jnp.arange(8, dtype=jnp.int32)) & 1
            ).reshape(g, -1)
            cmask = jnp.repeat(open_, 8, axis=1) & (child_bits > 0)

            if return_demand:
                outs.append(jnp.max(jnp.sum(cmask, axis=1)))

            if next_cap == 8 * fcap_l:
                # non-binding cap: skip the cosmetic compaction sort
                # (see the 2D mirror)
                nf = jnp.where(cmask, children, -1)
                ovf = jnp.zeros((g,), bool)
            else:
                (nf,), ovf = _sort_compact(
                    cmask, [jnp.where(cmask, children, -1)], next_cap
                )
            return tuple(outs) + (nf, ovf)

        def _dead(frontier, is_last=is_last, fcap_l=fcap_l,
                  nf_width=nf_width):
            zf = jnp.zeros((g, fcap_l), f32)
            zi = jnp.zeros((g, fcap_l), jnp.int32)
            zb = jnp.zeros((g, fcap_l), bool)
            outs = [zf, zf, zf, zf, zb, zi, zi, zb]
            if quarter_bits:
                outs += [zi, zf, zf, zf, zf]
            if is_last:
                return tuple(outs)
            return tuple(outs) + (
                jnp.full((g, nf_width), -1, jnp.int32),
                jnp.zeros((g,), bool),
            )

        # a frontier that died out (uniform 256K: levels 6-7 carry 8 and
        # 0 cells against a 16,384 cap — the schedule's collapsed-state
        # tail) skips its gather + theta math at runtime; static shapes
        # and caps are unchanged, so the worst case still fits.
        # NBODY_DEAD_LEVEL_SKIP=0 (read at trace time) disables the
        # lax.cond wrapper for same-invocation A/B measurement.
        if (
            fcap_l >= 1024
            and not return_demand
            and os.environ.get("NBODY_DEAD_LEVEL_SKIP", "1") != "0"
        ):
            res = jax.lax.cond(
                jnp.any(frontier >= 0), _level, _dead, frontier
            )
        else:
            res = _level(frontier)

        res = list(res)
        app_x.append(res.pop(0))
        app_y.append(res.pop(0))
        app_z.append(res.pop(0))
        app_m.append(res.pop(0))
        app_mask.append(res.pop(0))
        dir_s.append(res.pop(0))
        dir_c.append(res.pop(0))
        dir_mask.append(res.pop(0))
        if quarter_bits:
            dir_b.append(res.pop(0))
            dir_x.append(res.pop(0))
            dir_y.append(res.pop(0))
            dir_z.append(res.pop(0))
            dir_m.append(res.pop(0))
        if is_last:
            break
        if return_demand:
            demand.append(res.pop(0))
        frontier = res.pop(0)
        overflow = overflow | res.pop(0)
        fcap = next_cap

    (lx, ly, lz, lm), ovf_a = _sort_compact(
        jnp.concatenate(app_mask, axis=1),
        [
            jnp.concatenate(app_x, axis=1),
            jnp.concatenate(app_y, axis=1),
            jnp.concatenate(app_z, axis=1),
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
            jnp.concatenate(a, axis=1)
            for a in (dir_b, dir_x, dir_y, dir_z, dir_m)
        ]
    compacted, ovf_d = _sort_compact(
        jnp.concatenate(dir_mask, axis=1), dir_payload, direct_cap
    )
    dleaf, dc = compacted[0], compacted[1]
    ds = jnp.where(dc > 0, leaf_cum[jnp.where(dc > 0, dleaf, 0)], 0)
    overflow = overflow | ovf_a | ovf_d

    ranges = jnp.stack([ds, dc], axis=-1)  # [G, D, 2]
    quarters = (
        dict(bits=compacted[2], com=tuple(compacted[3:6]),
             mass=compacted[6])
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
        return (lx, ly, lz, lm), ranges, overflow, stats
    if quarter_bits:
        return (lx, ly, lz, lm), ranges, overflow, quarters
    return (lx, ly, lz, lm), ranges, overflow


def _superblock_pack_3d(sorted_xyz_gm):
    """Pack Morton-sorted sources 8 bodies per row: [Nsb, 32] =
    [x*8 | y*8 | z*8 | gm*8] (row gathers are latency-bound: a 32-wide
    row costs the same as 1-wide, see PERF.md)."""
    sx, sy, sz, sgm = sorted_xyz_gm
    ns = sx.shape[0]
    pad = ((ns + _SB - 1) // _SB) * _SB - ns

    def pad1(a):
        return jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) if pad else a

    return jnp.concatenate(
        [
            pad1(sx).reshape(-1, _SB),
            pad1(sy).reshape(-1, _SB),
            pad1(sz).reshape(-1, _SB),
            pad1(sgm).reshape(-1, _SB),
        ],
        axis=1,
    )  # [Nsb, 32]


def _gather_superblocks_3d(sb_packed, sb_idx, lo, hi):
    """Resolve superblock indices to per-lane (x, y, z, gm) with lanes
    outside [lo, hi) or invalid rows masked to gm = 0."""
    g = sb_idx.shape[0]
    dmask = sb_idx >= 0
    rows = sb_packed[jnp.where(dmask, sb_idx, 0)]  # [G, C, 32]
    lane = jnp.arange(_SB, dtype=jnp.int32)
    body_id = jnp.where(dmask, sb_idx, 0)[:, :, None] * _SB + lane
    lane_ok = (
        dmask[:, :, None]
        & (body_id >= lo[:, :, None])
        & (body_id < hi[:, :, None])
    )
    width = sb_idx.shape[1] * _SB
    dxs = rows[:, :, 0:_SB].reshape(g, width)
    dys = rows[:, :, _SB : 2 * _SB].reshape(g, width)
    dzs = rows[:, :, 2 * _SB : 3 * _SB].reshape(g, width)
    dws = jnp.where(lane_ok, rows[:, :, 3 * _SB :], 0.0).reshape(g, width)
    return dxs, dys, dzs, dws


def _evaluate_pallas_3d(
    positions_grouped,  # [G, S, 3]
    lists,  # (lx, ly, lz, lm) approx lists [G, L] each
    direct_sb,  # (sb_idx, lo, hi) [G, C] each
    sb_packed,  # [Nsb, 32] packed sorted sources
    *,
    g_const: float,
    softening: float,
    compensated: bool = False,
    eval_chunk: int = 64,
    dynamic: bool = True,
    k_tile: int = 2048,
):
    """Chunked over groups: 3D direct sections are wide (the [G, 8, K]
    source table would be ~3-6 GB of HBM at N=1M); materialising the
    gathered superblocks + packed table only ``eval_chunk`` groups at a
    time bounds peak HBM to ~chunk/G of that.  ``dynamic`` (default)
    evaluates each chunk with the occupancy-proportional manual-DMA
    kernel (list_eval_dynamic) instead of the padded-K-cap grid kernel —
    the round-2 "1M-scale inefficiency" fix (PERF.md)."""
    from .list_eval import list_eval_dynamic, list_eval_pallas

    f32 = positions_grouped.dtype
    lx, ly, lz, lm = lists
    # pad the approx section to a multiple of 2048: when the walk emits
    # fewer candidates than list_cap the compaction returns a narrower
    # (arbitrary-width) section, which must still tile at the kernel's
    # k_tile; every power-of-two tile <= 2048 divides the padded width
    apad = (-lx.shape[1]) % 2048
    if apad:
        lx, ly, lz, lm = (
            jnp.pad(a, ((0, 0), (0, apad))) for a in (lx, ly, lz, lm)
        )
    g_groups = lx.shape[0]
    sb_idx_all, lo_all, hi_all = direct_sb
    section = lx.shape[1]

    def chunk_fn(args):
        p, clx, cly, clz, clm, sbi, lo, hi = args
        dxs, dys, dzs, dws = _gather_superblocks_3d(sb_packed, sbi, lo, hi)
        src_x = jnp.concatenate([clx, dxs], axis=1)  # [C, K]
        src_y = jnp.concatenate([cly, dys], axis=1)
        src_z = jnp.concatenate([clz, dzs], axis=1)
        src_w = jnp.concatenate(
            [jnp.asarray(g_const, f32) * clm, dws], axis=1
        )
        cg, k = src_x.shape
        zero = jnp.zeros((cg, 1, k), f32)
        src = jnp.concatenate(
            [
                src_x[:, None, :],
                src_y[:, None, :],
                src_z[:, None, :],
                src_w[:, None, :],
            ]
            + [zero] * 4,
            axis=1,
        )  # [C, 8, K] rows [x, y, z, gm, 0*4]
        lens = jnp.stack(
            [
                jnp.sum(clm > 0, axis=1).astype(jnp.int32),
                _SB * jnp.sum(sbi >= 0, axis=1).astype(jnp.int32),
            ],
            axis=0,
        )  # [2, C]
        if dynamic and not compensated:
            return list_eval_dynamic(
                p.astype(jnp.float32),
                src,
                lens,
                softening=float(softening),
                section_offset=section,
                k_tile=k_tile,
            )
        return list_eval_pallas(
            p.astype(jnp.float32),
            src,
            lens,
            softening=float(softening),
            section_offset=section,
            compensated=compensated,
        )

    chunk = min(eval_chunk, g_groups)
    gpad = (-g_groups) % chunk
    if gpad:
        positions_grouped = jnp.pad(
            positions_grouped, ((0, gpad), (0, 0), (0, 0))
        )
        lx, ly, lz, lm = (
            jnp.pad(a, ((0, gpad), (0, 0))) for a in (lx, ly, lz, lm)
        )
        sb_idx_all = jnp.pad(
            sb_idx_all, ((0, gpad), (0, 0)), constant_values=-1
        )
        lo_all = jnp.pad(lo_all, ((0, gpad), (0, 0)))
        hi_all = jnp.pad(hi_all, ((0, gpad), (0, 0)))

    def r(a):
        return a.reshape(-1, chunk, *a.shape[1:])

    acc = jax.lax.map(
        chunk_fn,
        (
            r(positions_grouped), r(lx), r(ly), r(lz), r(lm),
            r(sb_idx_all), r(lo_all), r(hi_all),
        ),
    )  # [n_chunks, C, S, D]
    acc = acc.reshape(-1, *acc.shape[2:])[:g_groups]
    return acc[:, :, 0], acc[:, :, 1], acc[:, :, 2]


def _evaluate_3d(
    positions_grouped,  # [G, S, 3]
    lists,  # (lx, ly, lz, lm) [G, L]
    direct_sb,  # (sb_idx, lo, hi)
    sb_packed,  # [Nsb, 32]
    *,
    g_const: float,
    softening: float,
    group_chunk: int,
):
    """XLA fallback (CPU / interpret): dense bodies x list, chunked over
    groups — 3D mirror of ops/bh_grouped._evaluate."""
    f32 = positions_grouped.dtype
    eps = jnp.asarray(softening, f32)
    lx, ly, lz, lm = lists
    sb_idx_all, lo_all, hi_all = direct_sb

    def chunk_fn(args):
        p, cx, cy, cz, cm, sbi, lo, hi = args
        bx = p[:, :, 0:1]
        by = p[:, :, 1:2]
        bz = p[:, :, 2:3]

        def accum(sx, sy, sz, sw):
            dx = sx - bx  # [C, S, K]
            dy = sy - by
            dz = sz - bz
            d2 = dx * dx + dy * dy + dz * dz
            valid = (d2 > 0.0) & (sw > 0.0)
            d = jnp.sqrt(d2) + eps
            w = jnp.where(valid, sw / (jnp.where(valid, d2, 1.0) * d), 0.0)
            return (
                jnp.sum(w * dx, axis=-1),
                jnp.sum(w * dy, axis=-1),
                jnp.sum(w * dz, axis=-1),
            )

        ax, ay, az = accum(
            cx[:, None, :],
            cy[:, None, :],
            cz[:, None, :],
            jnp.asarray(g_const, f32) * cm[:, None, :],
        )
        dxs, dys, dzs, dws = _gather_superblocks_3d(sb_packed, sbi, lo, hi)
        ax2, ay2, az2 = accum(
            dxs[:, None, :], dys[:, None, :], dzs[:, None, :],
            dws[:, None, :],
        )
        return ax + ax2, ay + ay2, az + az2

    n_groups = positions_grouped.shape[0]
    chunk = min(group_chunk, n_groups)
    gpad = (-n_groups) % chunk
    if gpad:
        positions_grouped = jnp.pad(
            positions_grouped, ((0, gpad), (0, 0), (0, 0))
        )
        lx, ly, lz, lm = (
            jnp.pad(a, ((0, gpad), (0, 0))) for a in (lx, ly, lz, lm)
        )
        sb_idx_all = jnp.pad(
            sb_idx_all, ((0, gpad), (0, 0)), constant_values=-1
        )
        lo_all = jnp.pad(lo_all, ((0, gpad), (0, 0)))
        hi_all = jnp.pad(hi_all, ((0, gpad), (0, 0)))

    def r(a):
        return a.reshape(-1, chunk, *a.shape[1:])

    ax, ay, az = jax.lax.map(
        chunk_fn,
        (
            r(positions_grouped), r(lx), r(ly), r(lz), r(lm),
            r(sb_idx_all), r(lo_all), r(hi_all),
        ),
    )
    s = positions_grouped.shape[1]
    return (
        ax.reshape(-1, s)[:n_groups],
        ay.reshape(-1, s)[:n_groups],
        az.reshape(-1, s)[:n_groups],
    )


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
        "collect",
    ),
)
def bh3_accelerations_grouped(
    positions: jax.Array,  # [N, 3]
    masses: jax.Array,  # [N]
    *,
    g: float,
    theta: float = THETA_DEFAULT,
    max_depth: int | None = None,
    softening: float = BH_SOFTENING,
    group_size: int | None = None,
    frontier_cap: int | None = None,
    list_cap: int | None = None,
    direct_cap: int | None = None,
    direct_cell_max: int | None = None,
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
    collect: str | None = None,
):
    """Grouped 3D Barnes-Hut accelerations [N, 3] (+ overflow [N]).

    ``None`` caps resolve from :func:`cap_defaults_3d`; ``max_depth``
    defaults from :func:`tree3d.default_max_depth3` (bodies/leaf ~ 1);
    ``group_size=None`` resolves from :func:`default_group_size3`.
    ``collect`` picks the list-collection traversal: ``"gather"`` (the
    frontier walk), ``"dense"`` (window-stencil, ops/collect_dense3.py)
    or ``None``/``"auto"`` (reads ``NBODY_COLLECT3``, then the measured
    N-gate: dense at N >= 256K, gather below)."""
    n = positions.shape[0]
    f32 = positions.dtype
    if max_depth is None:
        max_depth = default_max_depth3(n)
    if group_size is None:
        group_size = default_group_size3(n)

    tree = build_octree(positions, masses, max_depth=max_depth)
    spyr = None
    if _resolve_collect(collect, n) == "dense":
        from .collect_dense3 import build_spatial_pyramid

        spyr = build_spatial_pyramid(
            positions, masses, tree.bounds, max_depth
        )

    # sources in Morton order: ONE packed [N, 4] row gather
    src_order = jnp.argsort(tree.codes)
    packed = jnp.concatenate([positions, masses[:, None]], axis=1)
    psort = packed[src_order]
    sorted_srcs = (
        psort[:, 0],
        psort[:, 1],
        psort[:, 2],
        jnp.asarray(g, f32) * psort[:, 3],
    )
    return grouped_eval_3d(
        positions,
        tree,
        sorted_srcs=sorted_srcs,
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
        target_sorted=psort[:, 0:3],
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
        collect=collect,
        spyr=spyr,
    )


# Auto gate for the dense (window-stencil) collector: measured
# same-invocation A/Bs on the v5e (PERF.md round 5) — 256K uniform
# 220.3 -> 145.4 ms/step (1.51x), 512K 449.0 -> 236.7 (1.90x); below
# the gate the gather walk wins (64K 16.0 vs 17.1, 128K 64.8 vs 73.6:
# small clouds' windows are full levels, so the extra spatial-pyramid
# build + window lanes outweigh the few gathered rows they delete).
DENSE_COLLECT_MIN_N = 262144


def _resolve_collect(collect: str | None, n_sources: int) -> str:
    """``None`` -> NBODY_COLLECT3 env (trace-time) -> auto N-gate."""
    mode = collect or os.environ.get("NBODY_COLLECT3") or "auto"
    if mode == "auto":
        return "dense" if n_sources >= DENSE_COLLECT_MIN_N else "gather"
    if mode not in ("gather", "dense"):
        raise ValueError(
            f"collect must be gather|dense|auto, got {mode!r}"
        )
    return mode


def grouped_eval_3d(
    target_positions: jax.Array,  # [Nt, 3] bodies to accelerate
    tree: Octree,
    *,
    sorted_srcs,  # (x, y, z, g*m) [Ns] each, ALL sources in Morton order
    g: float,
    theta: float = THETA_DEFAULT,
    softening: float = BH_SOFTENING,
    group_size: int | None = None,
    frontier_cap: int | None = None,
    list_cap: int | None = None,
    direct_cap: int | None = None,
    direct_cell_max: int | None = None,
    direct_body_cap: int | None = None,
    group_chunk: int = 32,
    return_diagnostics: bool = False,
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
    collect: str | None = None,
    spyr=None,
):
    """Grouped 3D evaluation of arbitrary targets against a prebuilt
    octree — the 3D mirror of ops/bh_grouped.grouped_eval (multi-chip:
    each device passes its local shard as targets against the gathered
    global sources; self-exclusion stays index-free via d2 > 0).  The
    window/offset/hint trio enables the sharded-source mode (see the 2D
    docstring).  ``collect="dense"`` routes list collection through the
    window-stencil walk (ops/collect_dense3.py, requires ``spyr``);
    the sharded-source mode (``window_cells``) stays on the gather
    walk."""
    n = target_positions.shape[0]
    ns = sorted_srcs[0].shape[0]
    max_depth = tree.max_depth

    n_eff = n_sources_hint if n_sources_hint else ns
    defaults = cap_defaults_3d(n_eff)
    if group_size is None:
        group_size = default_group_size3(n_eff)
    if direct_cell_max is None:
        direct_cell_max = direct_cell_max_default(n_eff)
    frontier_cap = frontier_cap or defaults["frontier_cap"]
    list_cap = list_cap or defaults["list_cap"]
    direct_cap = direct_cap or defaults["direct_cap"]
    direct_body_cap = direct_body_cap or defaults["direct_body_cap"]

    sb_packed = _superblock_pack_3d(sorted_srcs)

    if target_order is None:
        target_order = jnp.argsort(
            morton_codes_3d(target_positions, tree.bounds, max_depth)
        )
    gs = min(group_size, max(n, 1))
    n_pad = ((n + gs - 1) // gs) * gs
    tsort = (
        target_positions[target_order]
        if target_sorted is None
        else target_sorted
    )
    tsort = jnp.concatenate(
        [tsort, jnp.broadcast_to(tsort[-1], (n_pad - n, 3))], axis=0
    )
    pg = tsort.reshape(-1, gs, 3)  # [G, S, 3]

    if n_sub is None:
        n_sub = max(4, gs // 128)
    if gs % n_sub:
        n_sub = 1
    sub = pg.reshape(pg.shape[0], n_sub, gs // n_sub, 3)
    bbox = (
        jnp.min(sub[..., 0], axis=2),
        jnp.max(sub[..., 0], axis=2),
        jnp.min(sub[..., 1], axis=2),
        jnp.max(sub[..., 1], axis=2),
        jnp.min(sub[..., 2], axis=2),
        jnp.max(sub[..., 2], axis=2),
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if split_eval is None:
        # quarter-split (see ops/bh_grouped.grouped_eval): runs mode,
        # quarterable groups, sub-bboxes tiling the quarters
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
            and n_eff >= 768 * 1024
        )
    elif split_eval and (gs % 4 or n_sub % 4):
        raise ValueError(
            "split_eval=True requires group_size and n_sub divisible "
            f"by 4 (got {gs}, {n_sub})"
        )
    use_dense = (
        _resolve_collect(collect, n_eff) == "dense"
        and spyr is not None
        and window_cells is None
    )
    if use_dense:
        from .collect_dense3 import collect_lists_3d_dense

        collected = collect_lists_3d_dense(
            bbox,
            tree,
            spyr,
            theta=theta,
            softening=softening,
            frontier_caps=frontier_schedule_3d(
                frontier_cap, max_depth, n_eff
            ),
            list_cap=list_cap,
            direct_cap=direct_cap,
            direct_cell_max=direct_cell_max,
            quarter_bits=split_eval,
        )
    else:
        collected = _collect_lists_3d(
            bbox,
            tree,
            theta=theta,
            softening=softening,
            frontier_caps=frontier_schedule_3d(frontier_cap, max_depth, n_eff),
            list_cap=list_cap,
            direct_cap=direct_cap,
            direct_cell_max=direct_cell_max,
            window_cells=window_cells,
            quarter_bits=split_eval,
        )
    lists, ranges, overflow_g = collected[0:3]
    quarters = collected[3] if split_eval else None
    if range_offset is not None:
        ranges = ranges.at[:, :, 0].set(
            jnp.where(
                ranges[:, :, 1] > 0, ranges[:, :, 0] - range_offset, 0
            )
        )
    # NOTE: a merge_ranges + expand_runs_superblocks variant (now in
    # ops/experiments.py; interval-
    # union of the per-cell ranges) was measured end-to-end and LOST:
    # 290 ms/step at 256K vs 270 for the static per-cell expansion, with
    # run-cap overflow on 2 groups — the near-field cells that fail to
    # merge are numerous enough that run enumeration costs more than the
    # boundary-superblock slack it removes.  See PERF.md.
    if eval_mode is None:
        # runs is the measured default winner on TPU at every 3D scale
        # (PERF.md round-3 table: 64K 17.1 vs 21.0, 256K 220 vs 263,
        # 1M 1490 vs 2207 ms/step)
        if not eval_dynamic:
            eval_mode = "grid"
        else:
            eval_mode = "runs" if use_pallas else "dynamic"
    if split_eval and eval_mode != "runs":
        split_eval = False
        quarters = None
    if compensated:
        eval_mode = "grid"
    if eval_k_tile is None:
        # 3D near fields are ~10x wider than 2D: 512 is k-insensitive
        # at 1M (1479/1490/1497 at 256/512/1024) and wins at 256K
        eval_k_tile = 512 if eval_mode == "runs" else 2048
    if eval_mode == "runs":
        from .list_eval import runs_k_max

        eval_k_tile = min(eval_k_tile, runs_k_max())

    if use_pallas and eval_mode == "runs":
        # Gather-free direct path (see ops/bh_grouped._evaluate_pallas_runs
        # and list_eval_runs): no superblock machinery, no chunking — the
        # padded per-group source tables this file's chunked evaluator
        # exists to bound are never materialised at all.
        lx, ly, lz, lm = lists
        rc = run_cap or defaults["run_cap"]
        if seg_pack is None:
            # short-run occupancy fix: dcm=32 runs average ~150 bodies
            # against 512-lane tiles (24% occupancy measured at 256K,
            # 10% blobs); packing four 128-lane segments per step keeps
            # full-tile amortisation at segment occupancy (~56%).
            # Measured same-invocation at 256K uniform: 230.1 -> 180.2
            # ms/step.  Short-run states route back to plain tiles at
            # runtime (the mean-run-length cond in
            # bh_grouped._evaluate_pallas_runs), so requesting packing
            # is distribution-safe.  dcm=128 scales keep it off pending
            # a 512K/1M A/B (their runs are long; plain tiles are
            # already well occupied).
            env = os.environ.get("NBODY_SEG_PACK")
            if env is not None:
                seg_pack = int(env)
            else:
                # N-gate: at 64K the step is 13-15 ms and the second
                # expand pass + cond overhead exceeds the eval lanes
                # saved (measured 13.34 plain vs 14.29 packed / 14.95
                # gated); the win opens at 256K-class steps
                seg_pack = (
                    4
                    if direct_cell_max <= 64 and n_eff >= 131072
                    else 1
                )
        if seg_pack > 1 and eval_k_tile % (128 * seg_pack):
            seg_pack = 1
        if split_eval:
            acc_r, ovf_e = _evaluate_pallas_runs_split(
                pg,
                (lx, ly, lz),
                lm,
                ranges,
                quarters,
                sorted_srcs[0:3],
                sorted_srcs[3],  # already g*m
                g_const=g,  # scales the approx/extension raw masses
                softening=softening,
                k_tile=eval_k_tile,
                run_cap=rc,
                t_cap=direct_body_cap // eval_k_tile + 2 * rc,
            )
        else:
            acc_r, ovf_e = _evaluate_pallas_runs(
                pg,
                (lx, ly, lz),
                lm,
                ranges,
                sorted_srcs[0:3],
                sorted_srcs[3],  # already g*m (bh3_accelerations_grouped)
                g_const=g,  # scales the approx lists' raw masses
                softening=softening,
                k_tile=eval_k_tile,
                run_cap=rc,
                t_cap=direct_body_cap // eval_k_tile + 2 * rc,
                seg_pack=seg_pack,
            )
        overflow_g = overflow_g | ovf_e
        ax, ay, az = acc_r[:, :, 0], acc_r[:, :, 1], acc_r[:, :, 2]
    elif use_pallas:
        sb_cap = direct_body_cap // _SB + direct_cap
        sb_idx, sb_lo, sb_hi, ovf_b = _expand_ranges_superblocks(
            ranges, direct_cell_max, sb_cap
        )
        overflow_g = overflow_g | ovf_b
        ax, ay, az = _evaluate_pallas_3d(
            pg,
            lists,
            (sb_idx, sb_lo, sb_hi),
            sb_packed,
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
        ax, ay, az = _evaluate_3d(
            pg,
            lists,
            (sb_idx, sb_lo, sb_hi),
            sb_packed,
            g_const=g,
            softening=softening,
            group_chunk=group_chunk,
        )

    # un-sort by sorting on the permutation (see ops/bh_grouped.py: the
    # bitonic sort beats the per-row-serializing scatter)
    axs = ax.reshape(-1)[:n]
    ays = ay.reshape(-1)[:n]
    azs = az.reshape(-1)[:n]
    if return_diagnostics:
        ovf_sorted = jnp.repeat(overflow_g, gs)[:n]
        _, ax_o, ay_o, az_o, ovf = jax.lax.sort(
            [target_order, axs, ays, azs, ovf_sorted.astype(jnp.int32)],
            dimension=0, num_keys=1, is_stable=False,
        )
        return (
            jnp.stack([ax_o, ay_o, az_o], axis=-1),
            ovf.astype(bool),
        )
    _, ax_o, ay_o, az_o = jax.lax.sort(
        [target_order, axs, ays, azs],
        dimension=0, num_keys=1, is_stable=False,
    )
    return jnp.stack([ax_o, ay_o, az_o], axis=-1)
