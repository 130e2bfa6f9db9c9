"""Same-invocation A/B: quarter-split cache_approx on/off vs split off.

Usage: python scripts/split_cache_ab.py [n] [dims]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops import list_eval
from nbody_tpu.ops.bh3d import bh3_accelerations_grouped
from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

G = 6.67e-11


def slope(fn, cloud, masses, kw):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(positions, k):
        def body(p, _):
            return p + fn(p, masses, g=G, theta=0.5, **kw), None

        p, _ = jax.lax.scan(body, positions, None, length=k)
        return jnp.sum(p)

    for k in (2, 8):
        float(chain(cloud(), k))
    ts = {}
    for k in (2, 8):
        best = 1e9
        for _ in range(2):
            p = cloud()
            t0 = time.perf_counter()
            float(chain(p, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[8] - ts[2]) / 6 * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    dims = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fn = bh3_accelerations_grouped if dims == 3 else bh_accelerations_grouped
    rng = np.random.default_rng(0)
    masses = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )

    def cloud():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)

    print("backend:", jax.default_backend(), file=sys.stderr)
    orig = list_eval.list_eval_runs_split

    for label, split, cache in (
        ("split off        ", 0, None),
        ("split on, cache 1", 1, True),
        ("split on, cache 0", 1, False),
    ):
        if cache is not None:
            list_eval.list_eval_runs_split = functools.partial(
                orig, cache_approx=cache
            )
        try:
            ms = slope(fn, cloud, masses, dict(split_eval=split))
        finally:
            list_eval.list_eval_runs_split = orig
        print(f"N={n} dims={dims} {label}: {ms:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
