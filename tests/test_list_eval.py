"""Pallas list-evaluation kernels vs a dense XLA reference (interpret
mode on CPU; the TPU path is exercised by bh_grouped's use_pallas
default).

Two kernels share one contract (ops/list_eval): the grid kernel
(list_eval_pallas, static K-cap grid with DMA/compute skip) and the
dynamic kernel (list_eval_dynamic, manual double-buffered DMA with a
per-group dynamic trip count — the occupancy-proportional evaluator).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.ops.list_eval import list_eval_dynamic, list_eval_pallas

INTERPRET = jax.default_backend() != "tpu"

KERNELS = {
    "grid": list_eval_pallas,
    "dynamic": list_eval_dynamic,
}


def _dense_reference(tgt, src, eps):
    sx = src[:, 0, :][:, None, :]
    sy = src[:, 1, :][:, None, :]
    gm = src[:, 2, :][:, None, :]
    dx = sx - tgt[:, :, 0:1]
    dy = sy - tgt[:, :, 1:2]
    d2 = dx * dx + dy * dy
    valid = (d2 > 0) & (gm > 0)
    d = jnp.sqrt(d2) + eps
    w = jnp.where(valid, gm / (jnp.where(valid, d2, 1.0) * d), 0.0)
    return jnp.stack([jnp.sum(w * dx, -1), jnp.sum(w * dy, -1)], -1)


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_matches_dense_with_sparse_tiles(kernel):
    """Occupied, empty, and partially-occupied tiles (exercises the
    per-tile skip flags / dynamic trip counts) must agree with the dense
    evaluation."""
    rng = np.random.default_rng(0)
    g, s, k = 3, 64, 1024
    tgt = jnp.asarray(rng.uniform(-1, 1, (g, s, 2)), jnp.float32)
    src = jnp.zeros((g, 8, k), jnp.float32)
    # group 0: only tile 0; group 1: tiles 0 and 3; group 2: all empty
    spans = {0: [(0, 100)], 1: [(0, 50), (3 * 256, 3 * 256 + 80)]}
    for gi, ranges in spans.items():
        for lo, hi in ranges:
            n = hi - lo
            src = src.at[gi, 0, lo:hi].set(
                jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
            )
            src = src.at[gi, 1, lo:hi].set(
                jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
            )
            src = src.at[gi, 2, lo:hi].set(1e-3)
    # treat the whole list as one "approx" section: lens = occupied prefix
    lens = jnp.stack(
        [
            jnp.asarray([100, 3 * 256 + 80, 0], jnp.int32),
            jnp.zeros(3, jnp.int32),
        ],
        axis=0,
    )
    got = np.asarray(
        KERNELS[kernel](
            tgt, src, lens, softening=1e-15, section_offset=k,
            k_tile=256, interpret=INTERPRET,
        )
    )
    want = np.asarray(_dense_reference(tgt, src, 1e-15))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-8)
    assert np.all(got[2] == 0.0)  # fully-empty group


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_self_exclusion_d2_guard(kernel):
    """A source bit-equal to a target contributes nothing."""
    tgt = jnp.asarray([[[0.25, -0.5]] * 8], jnp.float32)
    src = jnp.zeros((1, 8, 256), jnp.float32)
    src = src.at[0, 0, 0].set(0.25).at[0, 1, 0].set(-0.5)
    src = src.at[0, 2, 0].set(1.0)  # the target itself as a source
    lens = jnp.asarray([[1], [0]], jnp.int32)
    out = np.asarray(
        KERNELS[kernel](tgt, src, lens, softening=1e-15,
                        section_offset=256, k_tile=256,
                        interpret=INTERPRET)
    )
    assert np.all(out == 0.0)


@pytest.mark.slow
def test_runs_evaluator_matches_xla_whole_path():
    """eval_mode='runs' (gather-free direct streaming from the sorted
    table) must reproduce the XLA fallback through the whole grouped
    engine, in 2D and 3D (interpret mode)."""
    import nbody_tpu.ops.list_eval as le
    from nbody_tpu.ops.bh3d import bh3_accelerations_grouped
    from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

    orig = le.list_eval_runs

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    rng = np.random.default_rng(3)
    n = 2048
    G_ = 6.67e-11
    m = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
    try:
        le.list_eval_runs = interp
        for dims, fn in ((2, bh_accelerations_grouped),
                         (3, bh3_accelerations_grouped)):
            p = jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)
            a_runs, ovf = fn(
                p, m, g=G_, group_size=512, group_chunk=8,
                use_pallas=True, eval_mode="runs", eval_k_tile=256,
                split_eval=False, return_diagnostics=True,
            )
            a_ref = fn(
                p, m, g=G_, group_size=512, group_chunk=8,
                use_pallas=False,
            )
            assert int(np.asarray(ovf).sum()) == 0
            scale = float(jnp.max(jnp.abs(a_ref)))
            d = float(jnp.max(jnp.abs(a_runs - a_ref)))
            assert d <= 1e-5 * scale, (dims, d, scale)
    finally:
        le.list_eval_runs = orig


@pytest.mark.slow
def test_runs_evaluator_seg_pack_whole_path():
    """seg_pack=2 (two 128-lane segments per kernel step, the short-run
    occupancy fix) must agree with the unpacked runs evaluator through
    the whole grouped engine (interpret mode), 2D and 3D."""
    import nbody_tpu.ops.bh_grouped as bg
    import nbody_tpu.ops.list_eval as le
    from nbody_tpu.ops.bh3d import bh3_accelerations_grouped
    from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

    orig = le.list_eval_runs
    orig_thr = bg.SEG_PACK_MIN_RUN_LANES

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    rng = np.random.default_rng(5)
    n = 2048
    G_ = 6.67e-11
    m = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
    try:
        le.list_eval_runs = interp
        # force the runtime run-length gate to the PACKED branch (small
        # test clouds have short runs that would route to plain)
        bg.SEG_PACK_MIN_RUN_LANES = -1.0
        for dims, fn in ((2, bh_accelerations_grouped),
                         (3, bh3_accelerations_grouped)):
            p = jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)
            kw = dict(
                g=G_, group_size=512, group_chunk=8, use_pallas=True,
                eval_mode="runs", eval_k_tile=256, split_eval=False,
                return_diagnostics=True,
            )
            a_packed, ovf = fn(p, m, seg_pack=2, **kw)
            a_plain, ovf0 = fn(p, m, seg_pack=1, **kw)
            assert int(np.asarray(ovf).sum()) == 0
            assert int(np.asarray(ovf0).sum()) == 0
            scale = float(jnp.max(jnp.abs(a_plain)))
            d = float(jnp.max(jnp.abs(a_packed - a_plain)))
            # identical lane set, accumulation regrouped across tiles
            assert d <= 1e-5 * scale, (dims, d, scale)
    finally:
        le.list_eval_runs = orig
        bg.SEG_PACK_MIN_RUN_LANES = orig_thr


@pytest.mark.slow
def test_split_evaluator_whole_path():
    """Quarter-split runs evaluation (split_eval=True): per-quarter
    direct ranges + COM extension section.  Physics stays in the BH
    theta=0.5 approximation class — each body's own theta requirement
    still holds (quarter d_min <= its true distance) — so the result
    matches the group-level evaluator to BH-approximation order, far
    tighter than the theta error itself (interpret mode, 2D and 3D)."""
    import nbody_tpu.ops.list_eval as le
    from nbody_tpu.ops.bh3d import bh3_accelerations_grouped
    from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

    orig = le.list_eval_runs_split

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    rng = np.random.default_rng(5)
    n = 2048
    G_ = 6.67e-11
    m = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
    try:
        le.list_eval_runs_split = interp
        for dims, fn in ((2, bh_accelerations_grouped),
                         (3, bh3_accelerations_grouped)):
            p = jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)
            a_split, ovf = fn(
                p, m, g=G_, group_size=512, group_chunk=8,
                use_pallas=True, eval_mode="runs", eval_k_tile=256,
                split_eval=True, return_diagnostics=True,
            )
            a_ref = fn(
                p, m, g=G_, group_size=512, group_chunk=8,
                use_pallas=False,
            )
            assert int(np.asarray(ovf).sum()) == 0
            scale = float(jnp.max(jnp.abs(a_ref)))
            d = float(jnp.max(jnp.abs(a_split - a_ref)))
            # extension COMs replace exact pairwise where the quarter's
            # theta passes: BH-approximation-order differences only
            assert d <= 2e-3 * scale, (dims, d, scale)
    finally:
        le.list_eval_runs_split = orig


def test_expand_runs_tiles():
    """Run -> k-tile table: 128-aligned starts walk the run in k_tile
    strides, [lo, hi) windows mask the alignment prefix and the run-end
    remainder, totals and overflow are per group."""
    from nbody_tpu.ops.bh_grouped import _expand_runs_tiles

    runs = np.zeros((2, 3, 2), np.int32)
    runs[0, 0] = (5, 300)    # base 0, span 305: tiles (0,[5,256)),
    #                          (256,[0,49)) at k_tile=256
    runs[0, 1] = (1000, 10)  # base 896: tile (896,[104,114))
    runs[1, 0] = (0, 2000)   # 8 tiles > t_cap of 4 -> overflow
    tiles, n_t, ovf = (
        np.asarray(a) for a in _expand_runs_tiles(jnp.asarray(runs), 256, 4)
    )
    assert n_t.tolist() == [3, 4]
    assert ovf.tolist() == [False, True]
    assert tiles[0, 0, :3].tolist() == [0, 256, 896]
    assert tiles[0, 1, :3].tolist() == [5, 0, 104]
    assert tiles[0, 2, :3].tolist() == [256, 49, 114]
    assert (tiles[0, 0, :3] % 128 == 0).all()
    # overflowing group keeps its first cap-worth of tiles, no spill
    assert tiles[1, 0, :4].tolist() == [0, 256, 512, 768]
    assert tiles[1, 1, :4].tolist() == [0] * 4
    assert tiles[1, 2, :4].tolist() == [256] * 4


def test_dynamic_matches_grid_two_sections():
    """Randomized two-section lists (varying per-group occupancy incl.
    zero): the dynamic kernel must reproduce the grid kernel exactly —
    same math, different scheduling."""
    rng = np.random.default_rng(7)
    g, s, d, k, off = 4, 256, 2, 1024, 512
    tgt = jnp.asarray(rng.uniform(-0.1, 0.1, (g, s, d)), jnp.float32)
    src = np.zeros((g, 8, k), np.float32)
    lens = np.zeros((2, g), np.int32)
    occupancies = [(0, 0), (1, 511), (500, 0), (512, 512)]
    for gi, (a_n, d_n) in enumerate(occupancies):
        lens[0, gi] = a_n
        lens[1, gi] = d_n
        src[gi, 0:d, :a_n] = rng.uniform(-0.1, 0.1, (d, a_n))
        src[gi, d, :a_n] = rng.uniform(0.01, 1.0, a_n)
        src[gi, 0:d, off:off + d_n] = rng.uniform(-0.1, 0.1, (d, d_n))
        src[gi, d, off:off + d_n] = rng.uniform(0.01, 1.0, d_n)
    kw = dict(softening=1e-15, section_offset=off, k_tile=256,
              s_tile=128, interpret=INTERPRET)
    a = KERNELS["grid"](jnp.asarray(tgt), jnp.asarray(src),
                        jnp.asarray(lens), **kw)
    b = KERNELS["dynamic"](jnp.asarray(tgt), jnp.asarray(src),
                           jnp.asarray(lens), **kw)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-12
    )


@pytest.mark.slow
def test_split_evaluator_compacted_ext_blobs():
    """Collapsed two-blob states stress the per-quarter extension
    compaction (round 4): dense near fields make many group-direct
    cells, each used by a different subset of quarters, so the
    compacted prefixes differ per quarter.  Split must still match the
    group-level evaluator to BH-approximation order (interpret mode)."""
    import nbody_tpu.ops.list_eval as le
    from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

    orig = le.list_eval_runs_split

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    rng = np.random.default_rng(9)
    n = 2048
    G_ = 6.67e-11
    m = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
    k = n // 2
    c = rng.uniform(-0.05, 0.05, (2, 2))
    pts = np.concatenate([
        rng.normal(c[0], 0.004, (k, 2)),
        rng.normal(c[1], 0.004, (n - k, 2)),
    ])
    p = jnp.asarray(np.clip(pts, -0.1, 0.1), jnp.float32)
    try:
        le.list_eval_runs_split = interp
        a_split, ovf = bh_accelerations_grouped(
            p, m, g=G_, group_size=512, group_chunk=8,
            use_pallas=True, eval_mode="runs", eval_k_tile=256,
            split_eval=True, return_diagnostics=True,
        )
        a_ref = bh_accelerations_grouped(
            p, m, g=G_, group_size=512, group_chunk=8, use_pallas=False,
        )
        assert int(np.asarray(ovf).sum()) == 0
        scale = float(jnp.max(jnp.abs(a_ref)))
        d = float(jnp.max(jnp.abs(a_split - a_ref)))
        assert d <= 2e-3 * scale, (d, scale)
    finally:
        le.list_eval_runs_split = orig
