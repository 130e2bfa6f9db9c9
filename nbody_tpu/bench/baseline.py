"""BASELINE.json benchmark configs as runnable scenarios.

Run: ``python -m nbody_tpu.bench.baseline [--configs 1,2,3] [--out FILE]``

The five configs (BASELINE.json "configs"):

1. All-pairs N=1,024 from the reference's golden init triplet, 100 steps,
   fixed dt — trajectory parity vs the f64 oracle of
   main_approach_1.cpp semantics.
2. All-pairs N=16,384 brute force on one TPU core (Pallas tiled kernel) —
   throughput + force parity vs the dense XLA formulation.
3. Barnes-Hut theta=0.5, N=65,536 — tree build + COM aggregation +
   traversal timing, and quadtree_init/final dump writing (plot_quadtree
   format; dumps are byte-identical to the reference builder per
   tests/test_native.py).
4. Strong scaling: Barnes-Hut N=262,144 across 1..n devices.
5. Weak scaling: 131,072 bodies/device up to 1M bodies, sharded with the
   per-step all_gather.

Each config reports a JSON record; on a single real chip, configs 4-5 run
only at the available device counts (the CI path runs them on the fake
8-device CPU mesh instead — tests/test_parallel.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF_DIR = os.environ.get(
    "NBODY_REFERENCE_DIR", "/root/reference/implementation"
)


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))  # scalar fetch = real sync (see bench.py)


def _timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _slope_step_seconds(step_fn, fresh_positions, k_lo=2, k_hi=8):
    """Per-step seconds via the slope method: the remote-TPU tunnel has a
    ~33 ms per-call floor and memoizes identical dispatches, so steps are
    chained on-device with fresh inputs and the slope between two chain
    lengths is reported (see PERF.md)."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(p, k):
        def body(c, _):
            return c + step_fn(c), None

        c, _ = jax.lax.scan(body, p, None, length=k)
        return jnp.sum(c)

    for k in (k_lo, k_hi):
        float(chain(fresh_positions(), k))
    ts = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(2):
            p = fresh_positions()
            t0 = time.perf_counter()
            float(chain(p, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)


def config1():
    """Golden-fixture all-pairs, 100 steps, parity vs the f64 oracle."""
    import jax.numpy as jnp

    from ..models import oracle
    from ..physics import pair_accelerations_dense
    from ..utils.textio import load_init_triplet

    n, steps, g = 1024, 100, 6.67e-11
    m, p, v = load_init_triplet(
        os.path.join(REF_DIR, "masses_init.txt"),
        os.path.join(REF_DIR, "positions_init.txt"),
        os.path.join(REF_DIR, "velocities_init.txt"),
        n,
    )
    traj = oracle.simulate(p, v, m, steps, dt=1.0, g=g, engine="naive")

    pj = jnp.asarray(p, jnp.float32)
    vj = jnp.asarray(v, jnp.float32)
    mj = jnp.asarray(m, jnp.float32)
    t0 = time.perf_counter()
    # parity horizon: N-body dynamics is chaotic, so f32-vs-f64 divergence
    # grows exponentially past close encounters; the reference records its
    # own CPU-vs-GPU runs deviating "around 45th iteration"
    # (observations.txt:43).  Parity is therefore judged at step 45 and
    # the full 100-step run is reported informationally.
    errs = {}
    for step_i in range(1, steps + 1):
        acc = pair_accelerations_dense(pj, mj, g=g)
        vj = vj + acc
        pj = pj + vj
        if step_i in (25, 45, 100):
            want_i = traj[step_i]
            scale_i = np.abs(want_i).max()
            e = np.abs(np.asarray(pj) - want_i)
            errs[step_i] = {
                "rms_rel": float(np.sqrt((e**2).mean()) / scale_i),
                "q995_rel": float(np.quantile(e, 0.995) / scale_i),
            }
    _sync(pj)
    elapsed = time.perf_counter() - t0

    # The binding parity criterion runs in f64 on the CPU backend (the
    # reference is all-f64; TPU f64 is emulated with reduced-precision
    # transcendentals).  This is a genuinely independent implementation
    # of the same math vs the numpy oracle — the reference's own
    # checkEqual methodology (project.cu:1027-1047).
    import jax

    x64_was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cpu = jax.devices("cpu")[0]
        f64_errs = {}
        with jax.default_device(cpu):
            p64 = jax.device_put(jnp.asarray(p, jnp.float64), cpu)
            v64 = jax.device_put(jnp.asarray(v, jnp.float64), cpu)
            m64 = jax.device_put(jnp.asarray(m, jnp.float64), cpu)
            for step_i in range(1, steps + 1):
                acc = pair_accelerations_dense(p64, m64, g=g)
                v64 = v64 + acc
                p64 = p64 + v64
                if step_i in (25, 45, 100):
                    want_i = traj[step_i]
                    scale_i = np.abs(want_i).max()
                    e64 = np.abs(np.asarray(p64) - want_i)
                    f64_errs[step_i] = float(
                        np.quantile(e64, 0.995) / scale_i
                    )
    finally:
        jax.config.update("jax_enable_x64", x64_was)

    return {
        "config": 1,
        "n": n,
        "steps": steps,
        "seconds": elapsed,
        "f32_err_by_step": errs,
        "f64_q995_rel_by_step": f64_errs,
        # Chaos bounds any cross-implementation comparison: the reference's
        # own f64 CPU-vs-GPU trajectories "start to deviate slightly around
        # 45th iteration" (observations.txt:43), and summation-order ulps
        # amplify ~e^(lambda t).  Parity is therefore binding at the
        # reference's own horizon (step 45); later steps are reported.
        "pass_1e-3_at_step45_f64": bool(f64_errs[45] < 1e-3),
        "pass_1e-3_at_step25_f32": bool(errs[25]["q995_rel"] < 1e-3),
    }


def config2():
    """Pallas all-pairs at N=16,384: throughput + parity vs dense XLA."""
    import jax
    import jax.numpy as jnp

    from ..ops.allpairs import allpairs_accelerations
    from ..physics import pair_accelerations_dense

    n, g = 16384, 6.67e-11
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    mj = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
    pj = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

    acc = allpairs_accelerations(pj, mj, g=g, interpret=interpret)
    want = pair_accelerations_dense(pj, mj, g=g)
    rel = float(
        jnp.max(jnp.abs(acc - want)) / jnp.max(jnp.abs(want))
    )

    def fresh():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

    sec = _slope_step_seconds(
        lambda p: allpairs_accelerations(p, mj, g=g, interpret=interpret),
        fresh,
    )
    return {
        "config": 2,
        "n": n,
        "pairs_per_sec": n * n / sec,
        "max_rel_err_vs_dense": rel,
    }


def config3(out_dir="."):
    """Barnes-Hut theta=0.5 at N=65,536 + dump writing."""
    import jax
    import jax.numpy as jnp

    from ..ops.bh_grouped import bh_accelerations_grouped
    from ..ops.tree import build_quadtree

    n, g = 65536, 6.67e-11
    rng = np.random.default_rng(0)
    m = (10 ** rng.uniform(-1, np.log10(0.5), n)).astype(np.float32)
    p = rng.uniform(-0.1, 0.1, (n, 2)).astype(np.float32)
    mj, pj = jnp.asarray(m), jnp.asarray(p)

    def fresh():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

    build_sec = _slope_step_seconds(
        lambda p: jnp.broadcast_to(
            build_quadtree(p, mj, max_depth=9).levels[0].comx[0] * 1e-20,
            p.shape,
        ),
        fresh,
    )

    acc, ovf = bh_accelerations_grouped(
        pj, mj, g=g, theta=0.5, return_diagnostics=True,
    )

    force_sec = _slope_step_seconds(
        lambda p: bh_accelerations_grouped(p, mj, g=g, theta=0.5),
        fresh,
    )

    # dumps via the native reference builder (byte-identical contract)
    dump_ok = False
    try:
        from ..utils import native

        text = native.tree_dump(p.astype(np.float64), m.astype(np.float64))
        with open(os.path.join(out_dir, "quadtree_init_baseline.txt"), "w") as f:
            f.write(text)
        dump_ok = True
    except Exception:
        pass
    return {
        "config": 3,
        "n": n,
        "tree_build_seconds": max(build_sec, 0.0),
        "step_seconds_incl_build": force_sec,
        "steps_per_sec": 1.0 / force_sec,
        "overflowed_bodies": int(np.asarray(ovf).sum()),
        "dump_written": dump_ok,
        "ref_best_step_seconds_40k": 0.0065,  # project_report.pdf p.24
    }


FAKE_MESH_NOTE = (
    "fake 8-device CPU mesh: all 8 devices share ONE physical host core, "
    "so flat wall-clock (efficiency ~1/devices) is the EXPECTED CORRECT "
    "outcome here — this record validates sharding correctness and the "
    "5-repeat protocol, not hardware speedup.  See "
    "'projection_real_hardware' for the modeled multi-chip curve "
    "(compute-per-chip + comm-volume / ICI-bandwidth)."
)


def config45(weak: bool):
    """Strong (fixed N=262,144) / weak (131,072 per device) scaling.

    NBODY_BASELINE_SCALE divides the body counts (CI runs the protocol at
    reduced size on the fake 8-device CPU mesh).

    Self-bootstrapping (the dryrun_multichip pattern): with fewer than 8
    visible devices (e.g. one real TPU chip) the protocol re-executes in
    a subprocess on a fake 8-device CPU mesh — jax.config.update wins
    over env vars against the ambient TPU plugin.  Fake-mesh records are
    labeled; wall-clock speedup there measures protocol correctness, not
    hardware scaling (all fake devices share one host)."""
    import jax

    if jax.device_count() < 8:
        rec = _config45_fake_mesh(weak)
        rec["note"] = FAKE_MESH_NOTE
        # One representative-N anchor on the REAL chip (round-2 weak #6:
        # the fake-mesh protocol records are tiny; this exercises the
        # same engine at the config's actual scaling N on the hardware
        # that exists, as the devices=1 reference point).
        if jax.default_backend() == "tpu":
            try:
                rec["anchor_devices1_real_chip"] = _config4_anchor(
                    n=131072 if weak else 262144
                )
            except Exception as e:  # anchor is additive, never fatal
                rec["anchor_devices1_real_chip"] = {
                    "error": f"{type(e).__name__}: {e}"
                }
        _annotate_comm_and_projection(rec, weak)
        return rec

    from ..config import MeshConfig, SimConfig
    from ..parallel import make_mesh, make_sharded_step, shard_state
    from ..rng import random_state

    scale = int(os.environ.get("NBODY_BASELINE_SCALE", "1"))
    n_dev_max = jax.device_count()
    on_tpu = jax.default_backend() == "tpu"
    results = []
    counts = [d for d in (1, 2, 4, 8) if d <= n_dev_max]
    for n_dev in counts:
        n = (131072 * n_dev if weak else 262144) // scale
        # the CPU fake mesh runs the XLA (non-Pallas) evaluator, which
        # materialises dense [chunk, gs, K] lists — keep them small there
        cfg = SimConfig(
            n_bodies=n,
            engine="barnes_hut",
            mesh=MeshConfig(dp=n_dev),
            group_chunk=4,
            group_size=2048 if on_tpu else 512,
            frontier_cap=None if on_tpu else 1024,
            list_cap=None if on_tpu else 768,
            direct_cap=None if on_tpu else 1024,
            direct_body_cap=None if on_tpu else 8192,
        )
        state = random_state(cfg)
        mesh = make_mesh(n_dev)
        state = shard_state(state, mesh)
        step = make_sharded_step(cfg, mesh, "dp_barnes_hut_grouped")
        state = step(state)
        _sync(state.positions)
        t0 = time.perf_counter()
        for _ in range(3):
            state = step(state)
        _sync(state.positions)
        sec = (time.perf_counter() - t0) / 3
        results.append({"devices": n_dev, "n": n, "step_seconds": sec})
    base = results[0]["step_seconds"]
    for r in results:
        r["speedup"] = base / r["step_seconds"] if not weak else None
        r["efficiency"] = (
            base / r["step_seconds"] / r["devices"] if not weak else
            base / r["step_seconds"]
        )
    rec = {
        "config": 5 if weak else 4,
        "backend": jax.default_backend(),
        "scale_divisor": scale,
        "points": results,
    }
    _annotate_comm_and_projection(rec, weak)
    return rec


def _annotate_comm_and_projection(rec, weak: bool) -> None:
    """Attach the analytic comm volume to every scaling point and a
    modeled real-hardware speedup/efficiency curve.

    The comm numbers come from parallel/memory.comm_bytes_per_step (the
    inventory is asserted against the traced jaxpr's collective operand
    shapes — tests/test_comm_model.py); the projection combines them
    with the real-chip devices=1 anchor:

        T(d) = compute(1 chip's share) + comm_bytes(d) / ICI_bandwidth

    where compute = anchor/d (strong, fixed N) or anchor (weak, fixed
    N/chip).  The ICI budget is an assumption knob (ICI_GBPS below;
    projection scales linearly in it) — the reference's analogue is its
    measured per-step PCIe staging cost (project.cu:968, 1010;
    project_report.pdf p.22)."""
    from ..config import SimConfig
    from ..parallel.memory import comm_bytes_per_step

    ICI_GBPS = 90.0  # assumed per-chip ICI send budget, GB/s (v4-class)
    mode = "dp_barnes_hut_grouped"
    for pt in rec.get("points", []):
        cfg = SimConfig(n_bodies=pt["n"])
        pt["comm_bytes_per_step_per_chip"] = comm_bytes_per_step(
            cfg, pt["devices"], mode
        )

    anchor = rec.get("anchor_devices1_real_chip") or {}
    t1 = anchor.get("step_seconds")
    if not t1:
        return
    n1 = anchor["n"]
    # Amdahl term: grouped mode rebuilds the WHOLE tree on every chip,
    # so the build cost does not scale with devices.  Measured (or
    # anchor-recorded) tree build at the anchor N; evaluation is the
    # rest and scales 1/d (strong) / stays per-chip-constant (weak).
    tree_sec = anchor.get("tree_build_seconds") or 0.0
    ev1 = max(t1 - tree_sec, 0.0)
    proj = []
    for d in (1, 2, 4, 8):
        n = n1 * d if weak else n1
        comm = comm_bytes_per_step(SimConfig(n_bodies=n), d, mode)
        compute = (tree_sec + ev1) if weak else (tree_sec + ev1 / d)
        t = compute + comm / (ICI_GBPS * 1e9)
        speedup = None if weak else t1 / t
        eff = (t1 / t) if weak else (t1 / t / d)
        proj.append(
            {
                "devices": d,
                "n": n,
                "modeled_step_seconds": t,
                "modeled_comm_seconds": comm / (ICI_GBPS * 1e9),
                "speedup": speedup,
                "efficiency": eff,
            }
        )
    rec["projection_real_hardware"] = {
        "inputs": {
            "anchor_step_seconds_devices1": t1,
            "anchor_n": n1,
            "anchor_tree_build_seconds": tree_sec,
            "mode": mode,
            "ici_gbytes_per_sec_assumed": ICI_GBPS,
            "comm_model": "parallel/memory.comm_bytes_per_step "
            "(jaxpr-verified inventory, ring-algorithm wire costs)",
            "amdahl_note": "tree build is redundant per chip in grouped "
            "mode and does not scale with devices; weak-scaling compute "
            "per chip is approximated as constant (each chip's targets "
            "are fixed; tree term grows with log N)",
        },
        "points": proj,
    }


def _config4_anchor(n=262144):
    """devices=1 point of config 4/5 at the REAL scaling N on the real
    chip (grouped BH, slope-timed)."""
    import jax.numpy as jnp

    from ..ops.bh_grouped import bh_accelerations_grouped
    from ..ops.tree import build_quadtree

    g = 6.67e-11
    rng = np.random.default_rng(0)
    m = jnp.asarray(
        10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32
    )

    def fresh():
        return jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

    sec = _slope_step_seconds(
        lambda p: bh_accelerations_grouped(p, m, g=g, theta=0.5),
        fresh,
        k_lo=2,
        k_hi=6,
    )
    # the redundant-per-chip Amdahl term for the scaling projection
    build_sec = _slope_step_seconds(
        lambda p: jnp.broadcast_to(
            build_quadtree(p, m).levels[0].comx[0] * 1e-20, p.shape
        ),
        fresh,
    )
    _, ovf = bh_accelerations_grouped(
        fresh(), m, g=g, theta=0.5, return_diagnostics=True
    )
    return {
        "devices": 1,
        "n": n,
        "step_seconds": sec,
        "tree_build_seconds": max(build_sec, 0.0),
        "overflowed_bodies": int(np.asarray(ovf).sum()),
        "backend": "tpu",
    }


def _config45_fake_mesh(weak: bool):
    """Re-exec config45 on a fake 8-device CPU mesh in a subprocess."""
    import subprocess

    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # keep the fake-mesh run tractable: all 8 "devices" share one host
    env.setdefault("NBODY_BASELINE_SCALE", "32")
    # the child must resolve nbody_tpu independent of the parent's cwd
    # (same fix as sweeps._bootstrap_fake_mesh)
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [pkg_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import json\n"
        "from nbody_tpu.bench import baseline\n"
        f"r = baseline.config45(weak={weak})\n"
        "print('RESULT:' + json.dumps(r))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env,
        capture_output=True, text=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT:"):
            rec = json.loads(line[len("RESULT:"):])
            rec["backend"] = "cpu-fake-8-device-mesh"
            return rec
    raise RuntimeError(
        f"fake-mesh config45 subprocess failed (rc={proc.returncode}): "
        f"{proc.stderr[-500:]}"
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--out", default="baseline_results.json")
    args = ap.parse_args(argv)
    wanted = {int(c) for c in args.configs.split(",")}
    report = []
    for c in sorted(wanted):
        print(f"running config {c}...", file=sys.stderr)
        try:
            if c == 1:
                report.append(config1())
            elif c == 2:
                report.append(config2())
            elif c == 3:
                report.append(config3())
            elif c == 4:
                report.append(config45(weak=False))
            elif c == 5:
                report.append(config45(weak=True))
        except Exception as e:  # record the failure, keep going
            report.append({"config": c, "error": str(e)[:500]})
        print(json.dumps(report[-1]), file=sys.stderr)
    # merge into an existing results file: a partial re-run (e.g.
    # --configs 2,3 to refresh the TPU numbers on a quieter window)
    # must not clobber the configs it did not run.  Atomic write —
    # same discipline as headline.refresh_config3_record.
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            report = [
                r for r in prior if r.get("config") not in wanted
            ] + report
            report.sort(key=lambda r: r.get("config", 99))
        except Exception:
            pass  # unreadable prior file: write the fresh records
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=2)
    os.replace(tmp, args.out)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
