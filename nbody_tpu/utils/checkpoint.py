"""Checkpoint / resume.

A strict superset of the reference's reproducibility mechanism, which only
persists *initial* state as text (save at project.cu:236-246/269-281,
reload via loadSimulationDataFromText project.cu:103-161): here any
mid-run (step, time, masses, positions, velocities) snapshot round-trips
through ``.npz`` and a run can resume exactly where it left off.
"""

from __future__ import annotations

import os

import numpy as np

from ..state import SimState, make_state


def save_checkpoint(path: str, state: SimState) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp,
        masses=np.asarray(state.masses),
        positions=np.asarray(state.positions),
        velocities=np.asarray(state.velocities),
        time=np.asarray(state.time),
        step=np.asarray(state.step),
    )
    # np.savez appends .npz to the temp name
    os.replace(tmp + ".npz", path)


def load_checkpoint(path: str, dtype=None) -> SimState:
    with np.load(path) as z:
        masses = z["masses"]
        if dtype is None:
            import jax.numpy as jnp

            dtype = jnp.dtype(masses.dtype)
        return make_state(
            masses,
            z["positions"],
            z["velocities"],
            time=float(z["time"]),
            step=int(z["step"]),
            dtype=dtype,
        )
