"""Slope-timed phase split of the grouped BH engines (2D and 3D).

Times nested prefixes of the pipeline (tree | +collect | +expand |
full) by the slope method; differences give per-phase costs.

Usage: python scripts/phase_split.py n=262144,dims=3 [spec...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

G = 6.67e-11


def split(n, dims, gs=2048, ks=(1, 3), reps=2, collect=None, **kw):
    rng = np.random.default_rng(0)
    masses = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )

    def cloud():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)

    if dims == 3:
        from nbody_tpu.ops.bh3d import (
            _collect_lists_3d,
            _superblock_pack_3d,
            bh3_accelerations_grouped,
            cap_defaults_3d,
            direct_cell_max_default,
            frontier_schedule_3d,
        )
        from nbody_tpu.ops.bh_grouped import _expand_ranges_superblocks
        from nbody_tpu.ops.tree3d import build_octree, default_max_depth3

        md = default_max_depth3(n)
        caps = cap_defaults_3d(n)
        dcm = direct_cell_max_default(n)
        fcaps = frontier_schedule_3d(caps["frontier_cap"], md, n)
        n_sub = max(4, gs // 128)

        def prefix(p, depth):
            tree = build_octree(p, masses, max_depth=md)
            src_order = jnp.argsort(tree.codes)
            packed = jnp.concatenate([p, masses[:, None]], axis=1)
            psort = packed[src_order]
            if depth == 0:
                return tree.raw[0][0, 0] + psort[0, 0]
            tsort = psort[:, 0:dims]
            pg = tsort.reshape(-1, gs, dims)
            sub = pg.reshape(pg.shape[0], n_sub, gs // n_sub, dims)
            bbox = sum(
                [
                    [jnp.min(sub[..., d_], axis=2),
                     jnp.max(sub[..., d_], axis=2)]
                    for d_ in range(dims)
                ],
                [],
            )
            if collect == "dense":
                from nbody_tpu.ops.collect_dense3 import (
                    build_spatial_pyramid,
                    collect_lists_3d_dense,
                )

                spyr = build_spatial_pyramid(
                    p, masses, tree.bounds, md
                )
                lists, ranges, ovf = collect_lists_3d_dense(
                    tuple(bbox), tree, spyr, theta=0.5,
                    softening=1e-15, frontier_caps=fcaps,
                    list_cap=caps["list_cap"],
                    direct_cap=caps["direct_cap"], direct_cell_max=dcm,
                )
            else:
                lists, ranges, ovf = _collect_lists_3d(
                    tuple(bbox), tree, theta=0.5, softening=1e-15,
                    frontier_caps=fcaps, list_cap=caps["list_cap"],
                    direct_cap=caps["direct_cap"], direct_cell_max=dcm,
                )
            if depth == 1:
                return lists[0][0, 0] + ranges[0, 0, 0].astype(jnp.float32)
            if kw.get("eval_mode") == "runs":
                from nbody_tpu.ops.bh_grouped import _expand_runs_tiles
                from nbody_tpu.ops.experiments import merge_ranges

                kt = kw.get("eval_k_tile") or 512  # engine auto (3D)
                rc = kw.get("run_cap") or 512
                merged, _ = merge_ranges(ranges, cap=rc)
                tiles, n_t, _ = _expand_runs_tiles(
                    merged, kt, caps["direct_body_cap"] // kt + 2 * rc
                )
                if depth == 2:
                    return lists[0][0, 0] + tiles.astype(jnp.float32)[0, 0, 0]
                raise ValueError
            sb_cap = caps["direct_body_cap"] // 8 + caps["direct_cap"]
            sb_idx, lo, hi, ovf2 = _expand_ranges_superblocks(
                ranges, dcm, sb_cap
            )
            if depth == 2:
                return (
                    lists[0][0, 0] + sb_idx.astype(jnp.float32)[0, 0]
                )
            raise ValueError

        full = functools.partial(
            bh3_accelerations_grouped, g=G, theta=0.5, collect=collect,
            **kw
        )
    else:
        from nbody_tpu.ops.bh_grouped import (
            _collect_lists,
            _expand_ranges_superblocks,
            bh_accelerations_grouped,
            cap_defaults,
            frontier_schedule,
        )
        from nbody_tpu.ops.tree import build_quadtree

        md = 9
        caps = cap_defaults(gs, n)
        fcaps = frontier_schedule(caps["frontier_cap"], md, n)
        n_sub = max(4, gs // 128)

        def prefix(p, depth):
            tree = build_quadtree(p, masses, max_depth=md)
            src_order = jnp.argsort(tree.codes)
            packed = jnp.concatenate([p, masses[:, None]], axis=1)
            psort = packed[src_order]
            if depth == 0:
                return tree.raw[0][0, 0] + psort[0, 0]
            tsort = psort[:, 0:2]
            pg = tsort.reshape(-1, gs, 2)
            sub = pg.reshape(pg.shape[0], n_sub, gs // n_sub, 2)
            bbox = (
                jnp.min(sub[..., 0], axis=2), jnp.max(sub[..., 0], axis=2),
                jnp.min(sub[..., 1], axis=2), jnp.max(sub[..., 1], axis=2),
            )
            lists, ranges, ovf = _collect_lists(
                bbox, tree, theta=0.5, softening=1e-15,
                frontier_caps=fcaps, list_cap=caps["list_cap"],
                direct_cap=caps["direct_cap"], direct_cell_max=32,
            )
            if depth == 1:
                return lists[0][0, 0] + ranges[0, 0, 0].astype(jnp.float32)
            if kw.get("eval_mode") == "runs":
                from nbody_tpu.ops.bh_grouped import _expand_runs_tiles
                from nbody_tpu.ops.experiments import merge_ranges

                kt = kw.get("eval_k_tile") or 256  # engine auto (2D)
                rc = kw.get("run_cap") or 256
                merged, _ = merge_ranges(ranges, cap=rc)
                tiles, n_t, _ = _expand_runs_tiles(
                    merged, kt, caps["direct_body_cap"] // kt + 2 * rc
                )
                if depth == 2:
                    return lists[0][0, 0] + tiles.astype(jnp.float32)[0, 0, 0]
                raise ValueError
            sb_cap = caps["direct_body_cap"] // 8 + caps["direct_cap"]
            sb_idx, lo, hi, ovf2 = _expand_ranges_superblocks(
                ranges, 32, sb_cap
            )
            if depth == 2:
                return lists[0][0, 0] + sb_idx.astype(jnp.float32)[0, 0]
            raise ValueError

        full = functools.partial(
            bh_accelerations_grouped, g=G, theta=0.5, **kw
        )

    def slope(fn):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(p, k):
            def body(c, _):
                out = fn(c)
                return c + out * 1e-30, None

            c, _ = jax.lax.scan(body, p, None, length=k)
            return jnp.sum(c)

        k_lo, k_hi = ks
        for k in (k_lo, k_hi):
            float(chain(cloud(), k))
        ts = {}
        for k in (k_lo, k_hi):
            best = 1e9
            for _ in range(reps):
                p = cloud()
                t0 = time.perf_counter()
                float(chain(p, k))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)

    t_tree = slope(lambda p: jnp.broadcast_to(prefix(p, 0) * 1e-30, p.shape))
    t_coll = slope(lambda p: jnp.broadcast_to(prefix(p, 1) * 1e-30, p.shape))
    t_exp = slope(lambda p: jnp.broadcast_to(prefix(p, 2) * 1e-30, p.shape))
    t_full = slope(lambda p: full(p, masses))
    print(
        f"N={n} dims={dims} gs={gs} {kw}: tree+sort {t_tree*1e3:.1f} | "
        f"collect {(t_coll-t_tree)*1e3:.1f} | "
        f"expand {(t_exp-t_coll)*1e3:.1f} | "
        f"eval(+rest) {(t_full-t_exp)*1e3:.1f} | "
        f"full {t_full*1e3:.1f} ms/step",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), file=sys.stderr)
    for spec in sys.argv[1:]:
        parts = dict(kv.split("=") for kv in spec.split(","))
        n = int(parts.pop("n", 65536))
        dims = int(parts.pop("dims", 2))
        gs = int(parts.pop("gs", 2048))
        ks = tuple(int(x) for x in parts.pop("ks", "1:3").split(":"))
        reps = int(parts.pop("reps", 2))
        mode = parts.pop("mode", None)
        coll = parts.pop("collect", None)
        kw = {k: int(v) for k, v in parts.items()}
        if mode:
            kw["eval_mode"] = mode
        split(n, dims, gs=gs, ks=ks, reps=reps, collect=coll, **kw)
