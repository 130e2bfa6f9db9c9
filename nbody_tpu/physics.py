"""Force laws and the semi-implicit (symplectic) Euler integrator.

Reference semantics being replicated:

* Naive all-pairs force (main_approach_1.cpp:53-75):
      F_i = sum_{j != i} G * m_i * m_j / (d^2 * d) * (p_j - p_i)
  with *no* softening.

* Barnes-Hut accepted-node force (project.cu:651-658, 765-771):
      d   = sqrt(d2) + 1e-15        # softening added to the distance
      F  += G * m_i * M_node / d2 * (disp / d)
  i.e. the magnitude uses the *unsoftened* d2 while the direction is
  normalised by the softened distance.

* Integrator (project.cu:795-836, fused kernel updateAccVelPos):
      a = F / m ;  v += a * dt ;  p += v * dt
  — position update uses the already-updated velocity (semi-implicit /
  symplectic Euler; report formula p_{t+1} = p_t + v_{t+1} * dt).

Because a_i = F_i / m_i, the target mass cancels; all engines compute
accelerations directly (one multiply saved per pair, identical math up to
fp rounding — the f64 oracle keeps the reference factoring for parity).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .state import SimState


def pair_accelerations_dense(
    positions: jax.Array,
    masses: jax.Array,
    g: float,
    softening: float = 0.0,
    mask_diagonal: bool = True,
) -> jax.Array:
    """O(N^2) accelerations with a dense [N, N] intermediate.

    XLA-only fallback used for small N and as the test oracle for the tiled
    Pallas kernel (nbody_tpu.ops.allpairs).  Matches main_approach_1.cpp
    semantics when softening == 0 (diagonal masked instead of skipped).
    """
    # disp[i, j] = p_j - p_i  (force on i points toward j)
    disp = positions[None, :, :] - positions[:, None, :]  # [N, N, 2]
    d2 = jnp.sum(disp * disp, axis=-1)  # [N, N]
    n = positions.shape[0]
    valid = d2 > 0.0
    if mask_diagonal:
        eye = jnp.eye(n, dtype=bool)
        valid = valid & ~eye
    safe_d2 = jnp.where(valid, d2, 1.0)
    inv_d = jax.lax.rsqrt(safe_d2)
    if softening:
        d = safe_d2 * inv_d
        w = masses[None, :] / (safe_d2 * (d + softening))
    else:
        w = masses[None, :] * inv_d * inv_d * inv_d
    w = jnp.where(valid, w, 0.0)
    acc = g * jnp.einsum("ij,ijk->ik", w, disp)
    return acc


def integrate(
    state: SimState, accelerations: jax.Array, dt: float
) -> SimState:
    """Semi-implicit Euler: v' = v + a*dt ; p' = p + v'*dt (project.cu:819-836)."""
    new_v = state.velocities + accelerations * dt
    new_p = state.positions + new_v * dt
    return SimState(
        masses=state.masses,
        positions=new_p,
        velocities=new_v,
        time=state.time + jnp.asarray(dt, dtype=state.time.dtype),
        step=state.step + 1,
    )


def kinetic_energy(state: SimState) -> jax.Array:
    v2 = jnp.sum(state.velocities**2, axis=-1)
    return 0.5 * jnp.sum(state.masses * v2)


def potential_energy(state: SimState, g: float) -> jax.Array:
    """Pairwise potential (diagnostic; O(N^2), use on small N)."""
    disp = state.positions[None, :, :] - state.positions[:, None, :]
    d = jnp.sqrt(jnp.sum(disp * disp, axis=-1))
    n = state.masses.shape[0]
    mm = state.masses[None, :] * state.masses[:, None]
    mask = ~jnp.eye(n, dtype=bool) & (d > 0)
    pe = jnp.where(mask, -g * mm / jnp.where(mask, d, 1.0), 0.0)
    return 0.5 * jnp.sum(pe)


def total_momentum(state: SimState) -> jax.Array:
    return jnp.sum(state.masses[:, None] * state.velocities, axis=0)
