"""Pallas kernel: per-group interaction-list evaluation for Barnes-Hut.

The grouped traversal (bh_grouped.py) reduces Barnes-Hut to, per body
group, a dense evaluation of  group bodies x interaction list  — the same
tile shape as the all-pairs kernel (allpairs.py) with a third leading grid
dimension over groups.  Evaluating it in XLA materialises [chunk, S, K]
HBM temporaries; this kernel streams list tiles through VMEM instead:

  grid (G, S/S_TILE, K/K_TILE): each step loads a (S_TILE, 8) body block
  and an (8, K_TILE) list tile, computes w = gm / (d2 * (d + eps)) on the
  VPU and accumulates sum(w * disp) per body into VMEM scratch; the final
  k step writes the block's accelerations.

List lengths vary per group while K is the static cap; lists are
left-compacted into two sections (approx cells, direct bodies), so the
prefetched per-group section lengths drive BOTH a compute skip and a DMA
skip: the source-block index map clamps out-of-occupancy tiles to the
last occupied tile index, and the Pallas pipeline elides the copy when
the block index is unchanged — a padding tile costs neither FLOPs nor
HBM traffic.  This is the TPU analogue of the reference's occupancy gate
(project.cu:971-974): resources are spent only on resident, useful data.

Semantics are the Barnes-Hut accepted-node force (project.cu:651-658,
765-771): softened direction, unsoftened magnitude denominator, with the
d2 > 0 guard providing index-free self-exclusion (bit-exact singleton
COMs / raw body positions, see bh_grouped.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set budget for the ~3 live (S_TILE, K_TILE) f32 temporaries
# (same n_live_tiles=3 x 0.75 discipline as utils/occupancy.allpairs_tiles;
# (512, 2048) compiles, (1024, 2048) does not).
_VMEM_BUDGET = 12 * 1024 * 1024
_LIVE = 3


def runs_k_max(s_tile: int = 512) -> int:
    """Largest k_tile the runs kernel compiles at: its measured scoped-
    VMEM footprint is ~17.5 MB at (s_tile, k_tile) = (512, 2048) — over
    the 16 MB limit — and linear in k_tile (1024 compiles and runs); the
    per-iteration live set is wider than the grid kernel's (window mask
    + where chains), hence the doubled live-count."""
    return max(128, _VMEM_BUDGET // (2 * _LIVE * s_tile * 4)) // 128 * 128


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
    dims=2,
):
    i = pl.program_id(0)
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # The list has two left-compacted sections: approx cells in
    # [0, a_n) and direct bodies in [section_offset, section_offset + d_n).
    # A tile only needs compute if it overlaps either occupied span.  The
    # source index map (below) already clamps non-occupied tiles to a
    # previously fetched block, so this guard must stay in exact sync with
    # the map: computing on a clamped (stale) block would double-count.
    a_n = lens_ref[0, i]
    d_n = lens_ref[1, i]
    start = k * k_tile
    end = start + k_tile
    occupied = (start < a_n) | (
        (end > section_offset) & (start < section_offset + d_n)
    )

    @pl.when(occupied)
    def _compute():
        # src rows 0..dims-1 are coordinates, row ``dims`` is g*m; the
        # packed layout leaves rows dims+1..7 as zero pad (2D: [x, y, gm],
        # 3D: [x, y, z, gm]).
        d2 = None
        disp = []
        for ax in range(dims):
            da = src_ref[0, ax : ax + 1, :] - tgt_ref[0, :, ax : ax + 1]
            disp.append(da)  # (S_TILE, K_TILE)
            d2 = da * da if d2 is None else d2 + da * da
        gm = src_ref[0, dims : dims + 1, :]

        valid = (d2 > 0.0) & (gm > 0.0)
        # rsqrt-based softened factoring, bit-matching allpairs.py: padded
        # lanes produce NaN (rsqrt(0)) that the where() kills.
        inv_d = jax.lax.rsqrt(d2)
        d = d2 * inv_d
        w = jnp.where(
            valid, gm / (d2 * (d + jnp.float32(softening))), 0.0
        )
        vs = [jnp.sum(w * da, axis=1, keepdims=True) for da in disp]
        if compensated:
            # Kahan across k tiles; compensation in scratch cols 4..6
            for col, v in enumerate(vs):
                s_prev = acc_ref[:, col : col + 1]
                c = acc_ref[:, col + 4 : col + 5]
                y = v - c
                t = s_prev + y
                acc_ref[:, col + 4 : col + 5] = (t - s_prev) - y
                acc_ref[:, col : col + 1] = t
        else:
            for col, v in enumerate(vs):
                acc_ref[:, col : col + 1] = acc_ref[:, col : col + 1] + v

    @pl.when(k == n_k_tiles - 1)
    def _write():
        out_ref[0, :, :] = acc_ref[:, :]
        if compensated:
            for col in range(dims):
                out_ref[0, :, col : col + 1] = (
                    acc_ref[:, col : col + 1]
                    - acc_ref[:, col + 4 : col + 5]
                )


def _dyn_kernel(
    lens_ref,  # SMEM [2, G] occupied section lengths
    tgt_ref,  # (1, S, 8) VMEM group body block
    src_hbm,  # [G, 8, K] packed sources, resident in HBM (ANY)
    out_ref,  # (1, S, 8) VMEM
    acc_ref,  # VMEM scratch (S, 8)
    buf_ref,  # VMEM scratch (2, 8, K_TILE) double buffer
    sem_ref,  # DMA semaphores (2,)
    *,
    softening,
    k_tile,
    off_tile,
    s_tile,
    n_s_tiles,
    dims,
):
    i = pl.program_id(0)
    kt = jnp.int32(k_tile)
    a_t = (lens_ref[0, i] + kt - 1) // kt  # occupied approx tiles
    d_t = (lens_ref[1, i] + kt - 1) // kt  # occupied direct tiles
    n_t = a_t + d_t  # dynamic trip count: THE point of this kernel

    def tile_j(t):
        # loop step t -> tile index in K: approx tiles first, then the
        # direct section starting at off_tile
        return jnp.where(t < a_t, t, off_tile + (t - a_t))

    def get_dma(slot, t):
        return pltpu.make_async_copy(
            src_hbm.at[i, :, pl.ds(tile_j(t) * kt, k_tile)],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(n_t > 0)
    def _warmup():
        get_dma(0, 0).start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_t)
        def _prefetch():
            get_dma(jax.lax.rem(t + 1, 2), t + 1).start()

        get_dma(slot, t).wait()
        src = buf_ref[slot]  # (8, K_TILE)
        gm = src[dims : dims + 1, :]
        # Partial trailing tiles need no explicit length mask: lists are
        # left-compacted with zero-padded tails (gm == 0 there), and the
        # K region between sections is zero too, so the gm > 0 guard
        # kills every non-occupied lane.
        for si in range(n_s_tiles):
            tgt = tgt_ref[0, si * s_tile : (si + 1) * s_tile, :]
            d2 = None
            disp = []
            for ax in range(dims):
                da = src[ax : ax + 1, :] - tgt[:, ax : ax + 1]
                disp.append(da)
                d2 = da * da if d2 is None else d2 + da * da
            valid = (d2 > 0.0) & (gm > 0.0)
            inv_d = jax.lax.rsqrt(d2)
            d = d2 * inv_d
            w = jnp.where(
                valid, gm / (d2 * (d + jnp.float32(softening))), 0.0
            )
            for col, da in enumerate(disp):
                v = jnp.sum(w * da, axis=1, keepdims=True)
                acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] = acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] + v
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)
    out_ref[0, :, :] = acc_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "softening", "section_offset", "k_tile", "s_tile", "interpret",
    ),
)
def list_eval_dynamic(
    targets: jax.Array,  # [G, S, D] group body positions (D = 2 or 3)
    sources: jax.Array,  # [G, 8, K] packed rows (see list_eval_pallas)
    lens: jax.Array,  # [2, G] int32 occupied section lengths
    *,
    softening: float,
    section_offset: int,
    k_tile: int = 2048,
    s_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Occupancy-proportional list evaluation: dynamic trip counts.

    The grid-based kernel (:func:`list_eval_pallas`) must iterate every
    k tile of the static K cap; its DMA/compute skip makes padding tiles
    cheap but not free, and at 3D/1M scale the cap is ~20-40x the median
    occupancy (~580 padded tiles vs ~25K occupied lanes, PERF.md "Known
    1M-scale inefficiency") — the grid iteration itself dominates.  Here
    the grid is one step per group and a ``fori_loop`` with a *dynamic*
    trip count walks exactly the occupied tiles of the two list sections,
    double-buffering each (8, K_TILE) tile HBM->VMEM with manual DMA
    (sources stay in HBM via ``memory_space=ANY``).  Cost per group is
    proportional to its ACTUAL list length — the reference's
    spend-only-on-resident-data discipline (project.cu:971-974) taken to
    its TPU conclusion.

    Same contract as :func:`list_eval_pallas` (zero-padded tails; the
    d2 > 0 / gm > 0 guards drop padding and self-pairs).  Returns
    [G, S, D] accelerations.
    """
    if jax.config.jax_enable_x64 and not interpret:
        raise ValueError(
            "list_eval_dynamic requires jax_enable_x64=False (TPU Mosaic "
            "has no int64/f64 lowering); for f64 physics use the NumPy "
            "oracle (nbody_tpu.models.oracle) or the native C++ engine"
        )
    g, s, dims = targets.shape
    if s % s_tile:
        s_tile = s if s < s_tile else math.gcd(s, s_tile)
    k_tile = min(k_tile, max(128, _VMEM_BUDGET // (_LIVE * s_tile * 4)))
    k_tile = k_tile // 128 * 128
    if k_tile < 128:
        raise ValueError(
            f"target tile {s_tile} too large for the "
            f"{_VMEM_BUDGET // 2**20} MB VMEM budget; reduce s_tile"
        )
    if section_offset % k_tile:
        k_tile = math.gcd(section_offset, k_tile)
        if k_tile % 128:
            raise ValueError(
                f"section_offset {section_offset} not tileable (need a "
                "multiple of 128 that also divides it); pad the approx "
                "section"
            )
    k = sources.shape[2]
    if k % k_tile:
        pad = k_tile - k % k_tile
        sources = jnp.pad(sources, ((0, 0), (0, 0), (0, pad)))
        k += pad
    n_s_tiles = s // s_tile
    off_tile = section_offset // k_tile

    tgt = jnp.zeros((g, s, 8), jnp.float32).at[:, :, 0:dims].set(targets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, s, 8), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, s, 8), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s, 8), jnp.float32),
            pltpu.VMEM((2, 8, k_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _dyn_kernel,
            softening=float(softening),
            k_tile=k_tile,
            off_tile=off_tile,
            s_tile=s_tile,
            n_s_tiles=n_s_tiles,
            dims=dims,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * s * k,
            bytes_accessed=(g * s * 8 + g * 8 * k + g * s * 8) * 4,
            transcendentals=g * s * k,
        ),
        interpret=interpret,
    )(lens.astype(jnp.int32), tgt, sources)
    return out[:, :, 0:dims]


def _runs_kernel(
    lens_ref,  # SMEM [2, G]: row 0 = approx lanes, row 1 = direct tiles
    tgt_ref,  # (1, S, 8) VMEM group body block
    approx_hbm,  # [G, 8, A] per-group approx lists (ANY/HBM)
    srct_hbm,  # [8, Npad] ALL sorted sources, transposed (ANY/HBM)
    tiles_hbm,  # [G, 4, T] int32 per-group direct tile table (ANY/HBM;
    #             row 3 is padding — int32 sublane tiling is 4)
    out_ref,  # (1, S, 8) VMEM
    acc_ref,  # VMEM scratch (S, 8)
    buf_ref,  # VMEM scratch (2, 8, K_TILE) double buffer
    tbl_ref,  # SMEM scratch (4, T) int32: rows [128-aligned tile
    #           start, first valid lane, one-past-last valid lane, pad]
    sem_ref,  # DMA semaphores (2,) — or (2, seg_pack) when packing
    tsem_ref,  # DMA semaphore for the table copy
    *,
    softening,
    k_tile,
    s_tile,
    n_s_tiles,
    dims,
    seg_pack=1,
):
    """Streaming list evaluation over approx + direct-run tiles.

    With ``seg_pack = P > 1`` the direct table rows describe 128·(k_tile
    /(128·P))-lane SEGMENTS rather than full tiles: each loop step DMAs
    P independent segments back-to-back into the one k_tile-wide buffer
    and masks each against its own [lo, hi) window.  Short Morton runs
    (3D dcm=32 scales measure 24% lane occupancy at k_tile=512) pack at
    segment granularity (~56%) while the per-step loop/compute costs
    stay amortised over the full k_tile."""
    i = pl.program_id(0)
    kt = jnp.int32(k_tile)
    sw = k_tile // seg_pack  # segment width (multiple of 128)
    a_t = (lens_ref[0, i] + kt - 1) // kt  # occupied approx tiles
    d_t = lens_ref[1, i]  # occupied direct (packed) tiles (pre-counted)
    n_t = a_t + d_t

    # the group's direct tile table: one small DMA into SMEM
    tdma = pltpu.make_async_copy(tiles_hbm.at[i], tbl_ref, tsem_ref)
    tdma.start()
    tdma.wait()

    def start_dma(slot, t):
        @pl.when(t < a_t)
        def _approx():
            pltpu.make_async_copy(
                approx_hbm.at[i, :, pl.ds(t * kt, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot]
                if seg_pack == 1
                else sem_ref.at[slot, 0],
            ).start()

        if seg_pack > 1:

            @pl.when(t >= a_t)
            def _direct_packed():
                base = (t - a_t) * seg_pack
                for p in range(seg_pack):
                    sp = pl.multiple_of(tbl_ref[0, base + p], 128)
                    pltpu.make_async_copy(
                        srct_hbm.at[:, pl.ds(sp, sw)],
                        buf_ref.at[slot, :, p * sw : (p + 1) * sw],
                        sem_ref.at[slot, p],
                    ).start()

            return

        @pl.when(t >= a_t)
        def _direct():
            # table starts are 128-aligned by construction
            # (_expand_runs_tiles); the hint lets Mosaic slice the lane
            # dimension of the tiled sorted table at a dynamic offset
            s = pl.multiple_of(tbl_ref[0, t - a_t], 128)
            pltpu.make_async_copy(
                srct_hbm.at[:, pl.ds(s, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            ).start()

    def wait_dma(slot, t):
        @pl.when(t < a_t)
        def _approx():
            pltpu.make_async_copy(
                approx_hbm.at[i, :, pl.ds(t * kt, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot]
                if seg_pack == 1
                else sem_ref.at[slot, 0],
            ).wait()

        if seg_pack > 1:

            @pl.when(t >= a_t)
            def _direct_packed():
                base = (t - a_t) * seg_pack
                for p in range(seg_pack):
                    sp = pl.multiple_of(tbl_ref[0, base + p], 128)
                    pltpu.make_async_copy(
                        srct_hbm.at[:, pl.ds(sp, sw)],
                        buf_ref.at[slot, :, p * sw : (p + 1) * sw],
                        sem_ref.at[slot, p],
                    ).wait()

            return

        @pl.when(t >= a_t)
        def _direct():
            s = pl.multiple_of(tbl_ref[0, t - a_t], 128)
            pltpu.make_async_copy(
                srct_hbm.at[:, pl.ds(s, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            ).wait()

    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(n_t > 0)
    def _warmup():
        start_dma(0, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_tile), 1)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_t)
        def _prefetch():
            start_dma(jax.lax.rem(t + 1, 2), t + 1)

        wait_dma(slot, t)
        src = buf_ref[slot]  # (8, K_TILE)
        # direct tiles slice the RAW sorted table: lanes outside the
        # run's [lo, hi) window belong to real neighbouring bodies (or
        # the alignment prefix) and MUST be masked, unlike the
        # zero-padded approx lists
        ti = jnp.maximum(t - a_t, 0)
        if seg_pack == 1:
            lo = jnp.where(t < a_t, 0, tbl_ref[1, ti])
            hi = jnp.where(t < a_t, kt, tbl_ref[2, ti])
            keep = (lane >= lo) & (lane < hi)
        else:
            # each packed segment masks against its own window (padded
            # segments carry lo == hi == 0); approx tiles keep every lane
            base = ti * seg_pack
            keep = None
            for p in range(seg_pack):
                lo_p = tbl_ref[1, base + p] + p * sw
                hi_p = tbl_ref[2, base + p] + p * sw
                kp = (lane >= lo_p) & (lane < hi_p)
                keep = kp if keep is None else (keep | kp)
            keep = keep | (t < a_t)
        gm = jnp.where(keep, src[dims : dims + 1, :], 0.0)
        for si in range(n_s_tiles):
            tgt = tgt_ref[0, si * s_tile : (si + 1) * s_tile, :]
            d2 = None
            disp = []
            for ax in range(dims):
                da = src[ax : ax + 1, :] - tgt[:, ax : ax + 1]
                disp.append(da)
                d2 = da * da if d2 is None else d2 + da * da
            valid = (d2 > 0.0) & (gm > 0.0)
            inv_d = jax.lax.rsqrt(d2)
            d = d2 * inv_d
            w = jnp.where(
                valid, gm / (d2 * (d + jnp.float32(softening))), 0.0
            )
            for col, da in enumerate(disp):
                v = jnp.sum(w * da, axis=1, keepdims=True)
                acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] = acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] + v
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)
    out_ref[0, :, :] = acc_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "softening", "k_tile", "s_tile", "seg_pack", "interpret"
    ),
)
def list_eval_runs(
    targets: jax.Array,  # [G, S, D] group body positions
    approx: jax.Array,  # [G, 8, A] approx lists (zero-padded tails)
    sources_t: jax.Array,  # [8, Npad] ALL sorted sources transposed:
    #                        rows [x, y, (z,) gm, 0...]; tail-padded by
    #                        >= k_tile zero columns
    tiles: jax.Array,  # [G, 3, T] int32: rows [tile start in sources_t
    #                    (multiple of 128), first valid lane, one-past-
    #                    last valid lane]; start must keep start+k_tile
    #                    within Npad (a 4th padding row is added here)
    lens: jax.Array,  # [2, G] int32: [approx lanes, direct tile count]
    *,
    softening: float,
    k_tile: int = 2048,
    s_tile: int = 512,
    seg_pack: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Gather-free list evaluation: direct sources stream straight from
    the Morton-sorted global table.

    The direct near field of a group is a handful of Morton-contiguous
    *runs* (interval union of the traversal's per-cell ranges,
    ops/experiments.merge_ranges promoted to the shipped path).  Instead
    of materialising per-group source tables via padded superblock
    gathers — at 3D/1M the gather alone touches ~54M rows/step — the
    kernel DMAs each run's k-tiles DIRECTLY from the [8, N] transposed
    sorted table: large contiguous transfers, zero gather, zero padded
    HBM materialisation.  Cost per group = occupied approx tiles +
    occupied direct tiles, like :func:`list_eval_dynamic`, but the
    direct K cap no longer exists at all.

    Per-tile [lo, hi) lane masking against the run window replaces zero
    padding (raw table lanes outside a run are real neighbouring bodies,
    and tile starts are rounded DOWN to 128 so Mosaic can prove the
    dynamic lane-dimension slice aligned — see _expand_runs_tiles).
    Returns [G, S, D] accelerations.

    With ``seg_pack = P > 1`` the ``tiles`` rows describe
    (k_tile // P)-lane segments (build them with
    ``_expand_runs_tiles(merged, k_tile // P, ...)``) and
    ``lens[1]`` counts PACKED tiles (= ceil(segments / P)): each kernel
    step DMAs P segments into one k_tile buffer and masks per segment.
    Short-run workloads keep full-tile amortisation at segment-level
    lane occupancy (3D 256K: 24% -> ~56% measured).
    """
    if jax.config.jax_enable_x64 and not interpret:
        raise ValueError(
            "list_eval_runs requires jax_enable_x64=False (TPU Mosaic "
            "has no int64/f64 lowering)"
        )
    if seg_pack > 1 and k_tile % (128 * seg_pack):
        raise ValueError(
            f"seg_pack={seg_pack} needs k_tile divisible by "
            f"{128 * seg_pack} (got {k_tile})"
        )
    g, s, dims = targets.shape
    if s % s_tile:
        s_tile = s if s < s_tile else math.gcd(s, s_tile)
    k_max = runs_k_max(s_tile)
    if k_tile > k_max:
        # the tile table is prebuilt with the caller's k_tile stride —
        # silently shrinking it here would skip source lanes
        raise ValueError(
            f"k_tile={k_tile} exceeds the VMEM budget ({k_max} at "
            f"s_tile={s_tile}); rebuild the tile table with a smaller "
            "eval_k_tile"
        )
    a = approx.shape[2]
    if a % k_tile:
        pad = k_tile - a % k_tile
        approx = jnp.pad(approx, ((0, 0), (0, 0), (0, pad)))
    n_s_tiles = s // s_tile
    if tiles.shape[2] % 128:
        # the per-group table DMA slices [4, T]; Mosaic requires the
        # minor dimension 128-aligned
        tiles = jnp.pad(
            tiles, ((0, 0), (0, 0), (0, 128 - tiles.shape[2] % 128))
        )
    # ... and the sublane dimension a multiple of the int32 tiling (4)
    tiles = jnp.pad(tiles, ((0, 0), (0, 4 - tiles.shape[1]), (0, 0)))
    t_cap = tiles.shape[2]

    tgt = jnp.zeros((g, s, 8), jnp.float32).at[:, :, 0:dims].set(targets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, s, 8), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, s, 8), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s, 8), jnp.float32),
            pltpu.VMEM((2, 8, k_tile), jnp.float32),
            pltpu.SMEM((4, t_cap), jnp.int32),
            pltpu.SemaphoreType.DMA(
                (2,) if seg_pack == 1 else (2, seg_pack)
            ),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _runs_kernel,
            softening=float(softening),
            k_tile=k_tile,
            s_tile=s_tile,
            n_s_tiles=n_s_tiles,
            dims=dims,
            seg_pack=seg_pack,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * s * (approx.shape[2] + t_cap * k_tile) // 4,
            bytes_accessed=(g * s * 16 + g * 8 * approx.shape[2]) * 4,
            transcendentals=g * s * 1024,
        ),
        interpret=interpret,
    )(
        lens.astype(jnp.int32),
        tgt,
        approx,
        sources_t,
        tiles.astype(jnp.int32),
    )
    return out[:, :, 0:dims]


def _runs_split_kernel(
    lens_ref,  # SMEM [3, 4G]: row 0 = approx lanes (per group, repeated
    #            4x), row 1 = occupied extension lanes for THIS quarter
    #            (the per-quarter table is left-compacted: only cells
    #            this quarter actually uses occupy the prefix), row 2 =
    #            direct tiles per QUARTER
    tgt_ref,  # (1, S/4, 8) VMEM quarter body block
    approx_hbm,  # [G, 8, A] per-group approx lists (ANY/HBM)
    ext_hbm,  # [4G, 8, E] per-QUARTER compacted extension tables: rows
    #           [coords..., gm, 0...] — ONLY the cells whose COM serves
    #           this quarter (occupancy-pruned; gm == 0 marks padding)
    srct_hbm,  # [8, Npad] ALL sorted sources, transposed (ANY/HBM)
    tiles_hbm,  # [4G, 4, T] int32 per-QUARTER direct tile table
    out_ref,  # (1, S/4, 8) VMEM
    acc_ref,  # VMEM scratch (S/4, 8)
    buf_ref,  # VMEM scratch (2, 8, K_TILE) double buffer
    appx_ref,  # VMEM scratch (8, A) group approx cache: HBM-loaded once
    #            per GROUP (at quarter 0), served VMEM->VMEM to all four
    #            quarters — the 4x grid no longer re-streams the shared
    #            approx list from HBM
    tbl_ref,  # SMEM scratch (4, T) int32
    sem_ref,  # DMA semaphores (2,)
    tsem_ref,  # DMA semaphore for the table copy
    asem_ref,  # DMA semaphore for the approx cache load
    *,
    softening,
    k_tile,
    s_tile,
    n_s_tiles,
    e_tiles,  # extension tiles per quarter (static: ceil(E / k_tile))
    dims,
    cache_approx,
):
    """Quarter-split variant of :func:`_runs_kernel`: grid step = one
    QUARTER of a group.  Three source sections: the group's shared
    approx list (VMEM-cached across the group's four quarters); this
    quarter's compacted extension table (cells direct for some other
    quarter whose COM serves this one — occupancy-pruned on the host, so
    the stream length tracks what the quarter actually uses, not the
    group-direct union); this quarter's own direct Morton-run tiles."""
    i = pl.program_id(0)
    gi = i // 4
    qi = jax.lax.rem(i, 4)
    kt = jnp.int32(k_tile)
    a_t = (lens_ref[0, i] + kt - 1) // kt
    e_t = jnp.minimum(
        (lens_ref[1, i] + kt - 1) // kt, jnp.int32(e_tiles)
    )
    d_t = lens_ref[2, i]
    n_t = a_t + e_t + d_t

    tdma = pltpu.make_async_copy(tiles_hbm.at[i], tbl_ref, tsem_ref)
    tdma.start()

    if cache_approx:
        # group approx cache: one HBM load per GROUP (grid steps are
        # sequential, scratch persists across them), occupied tiles only
        @pl.when((qi == 0) & (a_t > 0))
        def _load_approx():
            def _start(t, _):
                pltpu.make_async_copy(
                    approx_hbm.at[gi, :, pl.ds(t * kt, k_tile)],
                    appx_ref.at[:, pl.ds(t * kt, k_tile)],
                    asem_ref,
                ).start()
                return 0

            jax.lax.fori_loop(0, a_t, _start, 0)

            def _wait(t, _):
                pltpu.make_async_copy(
                    approx_hbm.at[gi, :, pl.ds(t * kt, k_tile)],
                    appx_ref.at[:, pl.ds(t * kt, k_tile)],
                    asem_ref,
                ).wait()
                return 0

            jax.lax.fori_loop(0, a_t, _wait, 0)

    tdma.wait()
    approx_src = appx_ref if cache_approx else None

    def start_or_wait(slot, t, start):
        @pl.when(t < a_t)
        def _approx():
            if cache_approx:
                c = pltpu.make_async_copy(
                    approx_src.at[:, pl.ds(t * kt, k_tile)],
                    buf_ref.at[slot],
                    sem_ref.at[slot],
                )
            else:
                c = pltpu.make_async_copy(
                    approx_hbm.at[gi, :, pl.ds(t * kt, k_tile)],
                    buf_ref.at[slot],
                    sem_ref.at[slot],
                )
            c.start() if start else c.wait()

        @pl.when((t >= a_t) & (t < a_t + e_t))
        def _ext():
            c = pltpu.make_async_copy(
                ext_hbm.at[i, :, pl.ds((t - a_t) * kt, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )
            c.start() if start else c.wait()

        @pl.when(t >= a_t + e_t)
        def _direct():
            s = pl.multiple_of(tbl_ref[0, t - a_t - e_t], 128)
            c = pltpu.make_async_copy(
                srct_hbm.at[:, pl.ds(s, k_tile)],
                buf_ref.at[slot],
                sem_ref.at[slot],
            )
            c.start() if start else c.wait()

    acc_ref[:, :] = jnp.zeros_like(acc_ref)

    @pl.when(n_t > 0)
    def _warmup():
        start_or_wait(0, 0, True)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k_tile), 1)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < n_t)
        def _prefetch():
            start_or_wait(jax.lax.rem(t + 1, 2), t + 1, True)

        start_or_wait(slot, t, False)
        src = buf_ref[slot]  # (8, K_TILE)
        is_dir = t >= a_t + e_t
        ti = jnp.maximum(t - a_t - e_t, 0)
        lo = jnp.where(is_dir, tbl_ref[1, ti], 0)
        hi = jnp.where(is_dir, tbl_ref[2, ti], kt)
        gm = src[dims : dims + 1, :]
        gm = jnp.where((lane >= lo) & (lane < hi), gm, 0.0)
        for si in range(n_s_tiles):
            tgt = tgt_ref[0, si * s_tile : (si + 1) * s_tile, :]
            d2 = None
            disp = []
            for ax in range(dims):
                da = src[ax : ax + 1, :] - tgt[:, ax : ax + 1]
                disp.append(da)
                d2 = da * da if d2 is None else d2 + da * da
            valid = (d2 > 0.0) & (gm > 0.0)
            inv_d = jax.lax.rsqrt(d2)
            d = d2 * inv_d
            w = jnp.where(
                valid, gm / (d2 * (d + jnp.float32(softening))), 0.0
            )
            for col, da in enumerate(disp):
                v = jnp.sum(w * da, axis=1, keepdims=True)
                acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] = acc_ref[
                    si * s_tile : (si + 1) * s_tile, col : col + 1
                ] + v
        return 0

    jax.lax.fori_loop(0, n_t, body, 0)
    out_ref[0, :, :] = acc_ref[:, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "softening", "k_tile", "s_tile", "interpret", "cache_approx"
    ),
)
def list_eval_runs_split(
    targets: jax.Array,  # [G, S, D] group body positions
    approx: jax.Array,  # [G, 8, A] group approx lists (zero-padded)
    ext: jax.Array,  # [4G, 8, E] per-QUARTER compacted extension
    #                  tables: rows [coords..., gm, 0...]; gm == 0 marks
    #                  padding (only the cells this quarter uses occupy
    #                  the prefix)
    sources_t: jax.Array,  # [8, Npad] sorted sources transposed
    tiles: jax.Array,  # [4G, 3, T] int32 per-QUARTER direct tile table
    lens: jax.Array,  # [3, 4G] int32: [approx lanes, occupied ext
    #                    lanes for the quarter, direct tile count]
    *,
    softening: float,
    k_tile: int = 512,
    s_tile: int = 512,
    interpret: bool = False,
    cache_approx: bool = True,
) -> jax.Array:
    """Quarter-split gather-free list evaluation (see _runs_split_kernel).

    Each group's 2048-body near field is the UNION of what its four
    Morton quarters need; splitting the direct set per quarter cuts the
    evaluated pair volume to what each quarter's own sub-bboxes fail
    theta against — the cells another quarter needs direct but this one
    does not contribute through the extension section as plain COMs
    (exactly what the traversal emits when theta passes).  The extension
    tables arrive occupancy-compacted per quarter and the shared approx
    list is VMEM-cached across each group's four grid steps.  Returns
    [G, S, D] accelerations."""
    if jax.config.jax_enable_x64 and not interpret:
        raise ValueError(
            "list_eval_runs_split requires jax_enable_x64=False (TPU "
            "Mosaic has no int64/f64 lowering)"
        )
    g, s, dims = targets.shape
    if s % 4:
        raise ValueError("quarter-split evaluation needs S % 4 == 0")
    sq = s // 4
    if sq % s_tile:
        s_tile = sq if sq < s_tile else math.gcd(sq, s_tile)
    k_max = runs_k_max(s_tile)
    if k_tile > k_max:
        raise ValueError(
            f"k_tile={k_tile} exceeds the VMEM budget ({k_max} at "
            f"s_tile={s_tile}); rebuild the tile table with a smaller "
            "eval_k_tile"
        )
    a = approx.shape[2]
    if a % k_tile:
        approx = jnp.pad(
            approx, ((0, 0), (0, 0), (0, k_tile - a % k_tile))
        )
    if cache_approx and approx.shape[2] * 8 * 4 > 4 * 1024 * 1024:
        raise ValueError(
            f"approx width {approx.shape[2]} overflows the 4 MiB VMEM "
            "group-cache budget; lower list_cap or eval_k_tile"
        )
    e = ext.shape[2]
    if e % k_tile:
        ext = jnp.pad(ext, ((0, 0), (0, 0), (0, k_tile - e % k_tile)))
    e_tiles = ext.shape[2] // k_tile
    n_s_tiles = sq // s_tile
    if tiles.shape[2] % 128:
        tiles = jnp.pad(
            tiles, ((0, 0), (0, 0), (0, 128 - tiles.shape[2] % 128))
        )
    tiles = jnp.pad(tiles, ((0, 0), (0, 4 - tiles.shape[1]), (0, 0)))
    t_cap = tiles.shape[2]

    tgt = jnp.zeros((g, s, 8), jnp.float32).at[:, :, 0:dims].set(targets)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4 * g,),
        in_specs=[
            pl.BlockSpec(
                (1, sq, 8), lambda i, *_: (i // 4, i % 4, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, sq, 8), lambda i, *_: (i // 4, i % 4, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((sq, 8), jnp.float32),
            pltpu.VMEM((2, 8, k_tile), jnp.float32),
            pltpu.VMEM(
                (8, approx.shape[2] if cache_approx else k_tile),
                jnp.float32,
            ),
            pltpu.SMEM((4, t_cap), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _runs_split_kernel,
            softening=float(softening),
            k_tile=k_tile,
            s_tile=s_tile,
            n_s_tiles=n_s_tiles,
            e_tiles=e_tiles,
            dims=dims,
            cache_approx=cache_approx,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * s
            * (approx.shape[2] + ext.shape[2] + t_cap * k_tile) // 4,
            bytes_accessed=(
                g * s * 16 + g * 8 * (approx.shape[2] + ext.shape[2])
            ) * 4,
            transcendentals=g * s * 1024,
        ),
        interpret=interpret,
    )(
        lens.astype(jnp.int32),
        tgt,
        approx,
        ext,
        sources_t,
        tiles.astype(jnp.int32),
    )
    return out[:, :, 0:dims]


@functools.partial(
    jax.jit,
    static_argnames=(
        "softening", "section_offset", "k_tile", "s_tile", "interpret",
        "compensated",
    ),
)
def list_eval_pallas(
    targets: jax.Array,  # [G, S, D] group body positions (D = 2 or 3)
    sources: jax.Array,  # [G, 8, K] packed rows [x, y, (z,) gm, 0...];
    #                      gm == 0 marks padding; coordinate rows 0..D-1,
    #                      g*m at row D
    lens: jax.Array,  # [2, G] int32 occupied lengths of the two sections
    #                    (row-major [2, G]: SMEM pads the minor dimension,
    #                    so [G, 2] would cost 512B/row = 1MB at G=2048)
    *,
    softening: float,
    section_offset: int,  # start of the second (direct) section in K
    # 2048 is the VMEM-budget maximum at s_tile=512 and measured 24%
    # faster than 1536 at 2D/64K (fewer grid steps); section offsets
    # (list caps) are kept multiples of 2048 so the gcd fallback below
    # never shrinks the tile
    k_tile: int = 2048,
    s_tile: int = 512,
    interpret: bool = False,
    compensated: bool = False,
) -> jax.Array:
    """Accelerations [G, S, D] of each group's bodies due to its list."""
    if jax.config.jax_enable_x64 and not interpret:
        raise ValueError(
            "list_eval_pallas requires jax_enable_x64=False (TPU Mosaic "
            "has no int64/f64 lowering); for f64 physics use the NumPy "
            "oracle (nbody_tpu.models.oracle) or the native C++ engine"
        )
    g, s, dims = targets.shape
    # Target tile: the all-pairs kernel's measured-best target block is 512
    # (occupancy.allpairs_tiles); small groups use one tile.
    if s % s_tile:
        s_tile = s if s < s_tile else math.gcd(s, s_tile)
    # K tile: must divide section_offset (tiles may not straddle the two
    # sections — the occupancy test is per-section) and respect the VMEM
    # live-temporary budget.
    k_tile = min(k_tile, max(128, _VMEM_BUDGET // (_LIVE * s_tile * 4)))
    k_tile = k_tile // 128 * 128
    if k_tile < 128:
        raise ValueError(
            f"target tile {s_tile} too large for the "
            f"{_VMEM_BUDGET // 2**20} MB VMEM budget; reduce s_tile"
        )
    if section_offset % k_tile:
        k_tile = math.gcd(section_offset, k_tile)
        if k_tile % 128:
            raise ValueError(
                f"section_offset {section_offset} not tileable (need a "
                "multiple of 128 that also divides it); pad the approx "
                "section"
            )
    k = sources.shape[2]
    if k % k_tile:
        pad = k_tile - k % k_tile
        sources = jnp.pad(sources, ((0, 0), (0, 0), (0, pad)))
        k += pad
    n_k_tiles = k // k_tile
    n_s_tiles = s // s_tile
    off_tile = section_offset // k_tile

    tgt = jnp.zeros((g, s, 8), jnp.float32).at[:, :, 0:dims].set(targets)

    def _src_map(i, si, j, lens_ref):
        # Clamp non-occupied tiles to the last occupied tile at or before
        # j, so the pipeline sees an unchanged block index and skips the
        # DMA (grid iterates j fastest => the clamped index was already
        # fetched).  Must mirror the kernel's `occupied` predicate.
        # int32 throughout: under jax_enable_x64 the Python-int literals
        # would otherwise promote to int64, which Mosaic cannot lower.
        kt = jnp.int32(k_tile)
        j = jnp.asarray(j, jnp.int32)
        a_t = (lens_ref[0, i] + kt - 1) // kt  # occupied approx tiles
        d_t = (lens_ref[1, i] + kt - 1) // kt  # occupied direct tiles
        last_a = jnp.maximum(a_t - 1, 0)
        last_d = jnp.where(d_t > 0, off_tile + d_t - 1, last_a)
        j_eff = jnp.where(
            j < a_t,
            j,
            jnp.where(
                j < off_tile,
                last_a,
                jnp.where((j < off_tile + d_t), j, last_d),
            ),
        )
        return (i, 0, j_eff)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, n_s_tiles, n_k_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, s_tile, 8), lambda i, si, j, *_: (i, si, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, k_tile),
                _src_map,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s_tile, 8), lambda i, si, j, *_: (i, si, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((s_tile, 8), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            softening=float(softening),
            n_k_tiles=n_k_tiles,
            k_tile=k_tile,
            section_offset=int(section_offset),
            compensated=compensated,
            dims=dims,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, s, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * g * s * k,
            bytes_accessed=(g * s * 8 + g * 8 * k + g * s * 8) * 4,
            transcendentals=g * s * k,
        ),
        interpret=interpret,
    )(lens.astype(jnp.int32), tgt, sources)
    return out[:, :, 0:dims]
