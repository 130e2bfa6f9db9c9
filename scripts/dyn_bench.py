"""A/B slope benchmark: dynamic (manual-DMA) vs grid list evaluator.

Usage: python scripts/dyn_bench.py n=65536,dims=2,dyn=1 [spec...]
Optional keys: ks=2:8 (chain lengths), init=uniform|blobs, reps=2.
See PERF.md methodology (slope method; fresh inputs; scalar-fetch sync).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

G = 6.67e-11


def bench(n, dims, dyn, ks=(2, 8), init="uniform", reps=2, mode=None, **kw):
    from nbody_tpu.ops.bh3d import bh3_accelerations_grouped
    from nbody_tpu.ops.bh_grouped import bh_accelerations_grouped

    fn = bh3_accelerations_grouped if dims == 3 else bh_accelerations_grouped
    rng = np.random.default_rng(0)
    masses = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )

    def cloud():
        if init == "blobs":
            k = n // 2
            c = rng.uniform(-0.05, 0.05, (2, dims))
            pts = np.concatenate([
                rng.normal(c[0], 0.004, (k, dims)),
                rng.normal(c[1], 0.004, (n - k, dims)),
            ])
            return jnp.asarray(np.clip(pts, -0.1, 0.1), jnp.float32)
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, dims)), jnp.float32)

    kw = dict(eval_dynamic=bool(dyn), **kw)
    if mode:
        kw["eval_mode"] = mode
    _, ovf = fn(
        cloud(), masses, g=G, theta=0.5, return_diagnostics=True, **kw
    )
    novf = int(np.asarray(ovf).sum())

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(positions, k):
        def body(p, _):
            return p + fn(p, masses, g=G, theta=0.5, **kw), None

        p, _ = jax.lax.scan(body, positions, None, length=k)
        return jnp.sum(p)

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
    step = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
    print(
        f"N={n} dims={dims} dyn={dyn} init={init} {kw}: "
        f"{step*1e3:.2f} ms/step, ovf={novf}",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), file=sys.stderr)
    for spec in sys.argv[1:]:
        parts = dict(kv.split("=") for kv in spec.split(","))
        n = int(parts.pop("n", 65536))
        dims = int(parts.pop("dims", 2))
        dyn = int(parts.pop("dyn", 1))
        ks = tuple(int(x) for x in parts.pop("ks", "2:8").split(":"))
        init = parts.pop("init", "uniform")
        reps = int(parts.pop("reps", 2))
        mode = parts.pop("mode", None)
        collect = parts.pop("collect", None)
        extra = {k: int(v) for k, v in parts.items()}
        if collect:
            extra["collect"] = collect
        bench(n, dims, dyn, ks=ks, init=init, reps=reps, mode=mode,
              **extra)
