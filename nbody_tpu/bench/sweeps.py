"""Scaling-experiment sweeps (the reference's L7 layer, without recompiles).

Reproduces the two protocols:

* strong scaling — fixed problem size, vary processor count
  (first_scaling_script.sh: 40,000 bodies, threads 1..40,000, 5 repeats,
  10 steps).  Processors here are chips on the dp mesh.
* weak scaling — problem size per processor fixed
  (second_scaling_script.sh: bodies=threads 1:1).
* bodies — vary N on fixed devices (the reference's weak-scaling axis as
  observable on a single chip).

Results-file format matches the scripts' output consumed by
plot_first_scale.py / plot_second_scale.py: a header, then per run a
``n_bodies, n_threads, n_simulations[, repetition], <program stdout>``
block where the timing lines ("GPU parallel computation took ... ") appear
verbatim (first_scaling_script.sh:14-15,36; second_scaling_script.sh:13,39).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from typing import List


def _run_one(config, state, step_fn):
    """One timed run; returns the program stdout text (timing lines)."""
    from ..models.simulation import Simulation

    sim = Simulation(config, state=state, step_fn=step_fn)
    buf = io.StringIO()
    with redirect_stdout(buf):
        _, timing = sim.run_contract()
        print()
        print(timing.total_line())
        print()
        print(timing.parallel_line())
    return buf.getvalue()


def _fresh_state(config, seed):
    from ..rng import random_state

    return random_state(config.replace(seed=seed))


def run_sweep(args) -> int:
    import jax

    from .. import parallel
    from ..config import MeshConfig, SimConfig

    base = SimConfig(
        n_bodies=args.n_bodies,
        n_dim=getattr(args, "dims", 2),
        n_steps=args.steps,
        dt=args.dt,
        g=args.g,
        engine=args.engine,
        theta=args.theta,
        max_depth=args.max_depth,
        softening=args.softening,
        bh_mode=args.bh_mode,
        group_size=args.group_size,
        dtype=args.precision,
        target_block=args.target_block,
        source_block=args.source_block,
        frontier_cap=args.frontier_cap,
    )

    if args.device_counts:
        device_counts = [int(x) for x in args.device_counts.split(",")]
    else:
        device_counts = [1, 2, 4, 8]
    device_counts = [d for d in device_counts if d <= jax.device_count()]
    if args.body_counts:
        body_counts = [int(x) for x in args.body_counts.split(",")]
    else:
        # second_scaling_script.sh:4 body axis
        body_counts = [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048,
                       4096, 8192, 16384, 32768, 40000]

    out_path = args.results_file
    header = (
        "n_bodies, n_threads, n_simulations, repetition, runtime"
        if args.experiment in ("weak", "bodies")
        else "n_bodies, n_threads, n_simulations, runtime"
    )
    lines: List[str] = [header]

    def one_point(n_bodies, n_devices, rep):
        cfg = base.replace(
            n_bodies=n_bodies, mesh=MeshConfig(dp=n_devices)
        )
        state = _fresh_state(cfg, seed=args.seed + rep)
        step_fn = None
        if n_devices > 1:
            if args.engine == "barnes_hut":
                mode = (
                    "dp_barnes_hut_grouped3"
                    if getattr(args, "dims", 2) == 3
                    else "dp_barnes_hut_grouped"
                )
            else:
                mode = "dp_allpairs"
            mesh = parallel.make_mesh(n_devices)
            state = parallel.shard_state(state, mesh)
            step_fn = parallel.make_sharded_step(cfg, mesh, mode)
        return _run_one(cfg, state, step_fn)

    if args.experiment == "strong":
        for n_dev in device_counts:
            for rep in range(1, args.repeats + 1):
                stdout = one_point(args.n_bodies, n_dev, rep)
                lines.append(
                    f"{args.n_bodies}, {n_dev}, {args.steps}, " + stdout
                )
                print(
                    f"strong: devices={n_dev} rep={rep} done",
                    file=sys.stderr,
                )
    elif args.experiment == "weak":
        per_device = args.n_bodies
        for rep_i, n_dev in enumerate(device_counts):
            for rep in range(1, args.repeats + 1):
                n_bodies = per_device * n_dev
                stdout = one_point(n_bodies, n_dev, rep)
                lines.append(
                    f"{n_bodies}, {n_dev}, {args.steps}, {rep}, " + stdout
                )
                print(
                    f"weak: devices={n_dev} N={n_bodies} rep={rep} done",
                    file=sys.stderr,
                )
    else:  # bodies
        for n_bodies in body_counts:
            for rep in range(1, args.repeats + 1):
                stdout = one_point(n_bodies, args.devices, rep)
                lines.append(
                    f"{n_bodies}, {args.devices}, {args.steps}, {rep}, "
                    + stdout
                )
                print(
                    f"bodies: N={n_bodies} rep={rep} done", file=sys.stderr
                )

    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"results written to {out_path}", file=sys.stderr)
    return 0
