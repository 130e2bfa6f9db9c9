"""Slope-timed phases of the 3D split evaluator: collect vs eval vs split.

Each phase runs inside a lax.scan chain (k=2 vs k=8, slope method) so the
~35 ms/dispatch host overhead of this 1-CPU box cancels; a tiny carry
perturbation defeats CSE between iterations.

Usage: python scripts/split_phase_ab.py [n]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops import bh3d
from nbody_tpu.ops.bh3d import (
    cap_defaults_3d,
    direct_cell_max_default,
    frontier_schedule_3d,
)
from nbody_tpu.ops.tree3d import build_octree, default_max_depth3

G = 6.67e-11
THETA = 0.5
SOFT = 1e-15


def slope(make_body, reps=2):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(k):
        def body(c, _):
            return make_body(c), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    for k in (2, 8):
        float(chain(k))
    ts = {}
    for k in (2, 8):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[8] - ts[2]) / 6 * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)), jnp.float32)
    masses = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )
    max_depth = default_max_depth3(n)
    defaults = cap_defaults_3d(n)
    dcm = direct_cell_max_default(n)
    gs = 2048
    n_sub = max(4, gs // 128)
    k_tile = 512
    rc = 512
    t_cap = defaults["direct_body_cap"] // k_tile + 2 * rc
    print(f"n={n} caps={defaults} dcm={dcm}", file=sys.stderr)

    @jax.jit
    def prepare(positions, masses):
        tree = build_octree(positions, masses, max_depth=max_depth)
        src_order = jnp.argsort(tree.codes)
        packed = jnp.concatenate([positions, masses[:, None]], axis=1)
        psort = packed[src_order]
        sorted_srcs = (
            psort[:, 0], psort[:, 1], psort[:, 2],
            jnp.asarray(G, jnp.float32) * psort[:, 3],
        )
        pg = psort[:, 0:3].reshape(-1, gs, 3)
        sub = pg.reshape(pg.shape[0], n_sub, gs // n_sub, 3)
        bbox = (
            jnp.min(sub[..., 0], axis=2), jnp.max(sub[..., 0], axis=2),
            jnp.min(sub[..., 1], axis=2), jnp.max(sub[..., 1], axis=2),
            jnp.min(sub[..., 2], axis=2), jnp.max(sub[..., 2], axis=2),
        )
        return tree, sorted_srcs, pg, bbox

    tree, sorted_srcs, pg, bbox = prepare(positions, masses)
    fcaps = frontier_schedule_3d(defaults["frontier_cap"], max_depth, n)

    def collect(bbox, qbits):
        return bh3d._collect_lists_3d(
            bbox, tree, theta=THETA, softening=SOFT,
            frontier_caps=fcaps,
            list_cap=defaults["list_cap"],
            direct_cap=defaults["direct_cap"],
            direct_cell_max=dcm,
            window_cells=None,
            quarter_bits=qbits,
        )

    def perturb(c):
        return tuple(b + c * jnp.float32(1e-12) for b in bbox)

    ms = slope(lambda c: jnp.sum(collect(perturb(c), False)[1]
                                 ).astype(jnp.float32) * 0 + c + 1)
    print(f"collect(qbits=0): {ms:.2f} ms/step")
    ms = slope(lambda c: jnp.sum(collect(perturb(c), True)[1]
                                 ).astype(jnp.float32) * 0 + c + 1)
    print(f"collect(qbits=1): {ms:.2f} ms/step")

    coll_plain = jax.jit(lambda b: collect(b, False))(bbox)
    coll_q = jax.jit(lambda b: collect(b, True))(bbox)
    lists, ranges = coll_plain[0], coll_plain[1]
    lx, ly, lz, lm = lists
    listsq, rangesq, quarters = coll_q[0], coll_q[1], coll_q[3]
    qx, qy, qz, qm = listsq

    def eval_runs(c):
        acc, _ = bh3d._evaluate_pallas_runs(
            pg + c * jnp.float32(1e-12), (lx, ly, lz), lm, ranges,
            sorted_srcs[0:3], sorted_srcs[3],
            g_const=G, softening=SOFT, k_tile=k_tile,
            run_cap=rc, t_cap=t_cap,
        )
        return jnp.sum(acc) * 0 + c + 1

    ms = slope(eval_runs)
    print(f"eval runs (no split): {ms:.2f} ms/step")

    def eval_split(c):
        acc, _ = bh3d._evaluate_pallas_runs_split(
            pg + c * jnp.float32(1e-12), (qx, qy, qz), qm, rangesq,
            quarters,
            sorted_srcs[0:3], sorted_srcs[3],
            g_const=G, softening=SOFT, k_tile=k_tile,
            run_cap=rc, t_cap=t_cap,
        )
        return jnp.sum(acc) * 0 + c + 1

    ms = slope(eval_split)
    print(f"eval split: {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
