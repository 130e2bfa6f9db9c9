"""Simulation state: structure-of-arrays body data, registered as a pytree.

Mirrors the reference's layout — masses [N], positions [N,2], velocities
[N,2] (reference project.cu:38-43 ``std::array`` SoA) — so the text-file
contracts (SURVEY.md section 2.11) map 1:1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Bodies + simulation clock.

    ``time`` is the running absolute time (reference ``absolute_t``,
    project.cu:947/956) and ``step`` the integer step counter; both ride
    along in the jitted step so checkpoints are self-describing.
    """

    masses: jax.Array  # [N]
    positions: jax.Array  # [N, 2]
    velocities: jax.Array  # [N, 2]
    time: jax.Array  # scalar
    step: jax.Array  # scalar int32
    # bodies whose traversal caps overflowed in the step that produced
    # this state (global count across shards — sharded steps psum it).
    # The carried-in-state analogue of the reference kernel's stack-guard
    # printfs (project.cu:712-721); 0 for engines that cannot overflow.
    overflow: jax.Array  # scalar int32

    @property
    def n_bodies(self) -> int:
        return self.masses.shape[0]

    @property
    def dtype(self):
        return self.positions.dtype


def make_state(
    masses,
    positions,
    velocities,
    time: float = 0.0,
    step: int = 0,
    dtype=jnp.float32,
) -> SimState:
    masses = jnp.asarray(masses, dtype=dtype)
    positions = jnp.asarray(positions, dtype=dtype)
    velocities = jnp.asarray(velocities, dtype=dtype)
    if (
        masses.ndim != 1
        or positions.ndim != 2
        or positions.shape[0] != masses.shape[0]
        or positions.shape[1] not in (2, 3)
    ):
        raise ValueError(
            f"bad shapes: masses {masses.shape}, positions {positions.shape}"
            " (expected [N] and [N, 2|3])"
        )
    if velocities.shape != positions.shape:
        raise ValueError(
            f"velocities shape {velocities.shape} != positions {positions.shape}"
        )
    return SimState(
        masses=masses,
        positions=positions,
        velocities=velocities,
        time=jnp.asarray(time, dtype=dtype),
        step=jnp.asarray(step, dtype=jnp.int32),
        overflow=jnp.asarray(0, dtype=jnp.int32),
    )


def to_numpy(state: SimState):
    """Host copies (used by the text-I/O layer and checkpointing)."""
    return (
        np.asarray(state.masses),
        np.asarray(state.positions),
        np.asarray(state.velocities),
        float(state.time),
        int(state.step),
    )
