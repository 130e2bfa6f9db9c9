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


def pair_accelerations_chunked(
    positions: jax.Array,
    masses: jax.Array,
    g: float,
    softening: float = 0.0,
    chunk: int | None = None,
) -> jax.Array:
    """O(N^2) accelerations without the dense [N, N] intermediate.

    Targets are processed ``chunk`` rows at a time under ``lax.map`` so
    peak memory is chunk x N instead of N x N — the precision-preserving
    fallback for float64 configs (TPU Mosaic kernels are f32-only; the
    reference is all-f64, project.cu:38-43) and for potential-energy
    reductions at large N on CPU.  Same semantics as
    :func:`pair_accelerations_dense` (d2 > 0 guard excludes self-pairs
    and coincident padding).
    """
    n, dims = positions.shape
    if chunk is None:
        # bound the [chunk, N, D] intermediate to ~2^24 elements
        chunk = max(128, min(n, (1 << 24) // max(n, 1)))
    chunk = min(chunk, n)
    pad = (-n) % chunk
    tgt = positions
    if pad:
        # far-away sentinel rows: results sliced off below
        tgt = jnp.concatenate(
            [tgt, jnp.full((pad, dims), 1e15, tgt.dtype)], axis=0
        )

    def block_fn(tblock):
        disp = positions[None, :, :] - tblock[:, None, :]  # [C, N, D]
        d2 = jnp.sum(disp * disp, axis=-1)
        valid = d2 > 0.0
        safe_d2 = jnp.where(valid, d2, 1.0)
        inv_d = jax.lax.rsqrt(safe_d2)
        if softening:
            d = safe_d2 * inv_d
            w = masses[None, :] / (safe_d2 * (d + softening))
        else:
            w = masses[None, :] * inv_d * inv_d * inv_d
        w = jnp.where(valid, w, 0.0)
        return g * jnp.einsum("ij,ijk->ik", w, disp)

    acc = jax.lax.map(block_fn, tgt.reshape(-1, chunk, dims))
    return acc.reshape(-1, dims)[:n]


def integrate(
    state: SimState, accelerations: jax.Array, dt: float, overflow=None
) -> SimState:
    """Semi-implicit Euler: v' = v + a*dt ; p' = p + v'*dt (project.cu:819-836).

    ``overflow`` is the count of bodies whose traversal caps overflowed
    while computing ``accelerations`` (0 when the engine cannot
    overflow); it rides in the returned state as per-step telemetry."""
    new_v = state.velocities + accelerations * dt
    new_p = state.positions + new_v * dt
    if overflow is None:
        overflow = jnp.asarray(0, jnp.int32)
    return SimState(
        masses=state.masses,
        positions=new_p,
        velocities=new_v,
        time=state.time + jnp.asarray(dt, dtype=state.time.dtype),
        step=state.step + 1,
        overflow=jnp.asarray(overflow, jnp.int32),
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


def potential_per_body_chunked(
    positions: jax.Array,
    masses: jax.Array,
    g: float,
    chunk: int | None = None,
) -> jax.Array:
    """phi_i = sum_{j != i} -g*m_j/d_ij with a [chunk, N] intermediate
    (the CPU / f64-preserving path of :func:`potential_energy_scalable`)."""
    n = positions.shape[0]
    dims = positions.shape[1]
    if chunk is None:
        chunk = max(128, min(n, (1 << 24) // max(n, 1)))
    chunk = min(chunk, n)
    pad = (-n) % chunk
    tgt = positions
    if pad:
        tgt = jnp.concatenate(
            [tgt, jnp.full((pad, dims), 1e15, tgt.dtype)], axis=0
        )

    def block_fn(tblock):
        disp = positions[None, :, :] - tblock[:, None, :]
        d2 = jnp.sum(disp * disp, axis=-1)
        valid = d2 > 0.0
        inv_d = jax.lax.rsqrt(jnp.where(valid, d2, 1.0))
        return jnp.sum(
            jnp.where(valid, -g * masses[None, :] * inv_d, 0.0), axis=-1
        )

    phi = jax.lax.map(block_fn, tgt.reshape(-1, chunk, dims))
    return phi.reshape(-1)[:n]


def potential_energy_scalable(state: SimState, g: float) -> jax.Array:
    """Pairwise potential energy at any N.

    Dispatch: tiny N -> the dense diagnostic; TPU f32 -> the tiled
    Pallas reduction (ops.allpairs.allpairs_potential); otherwise the
    chunked XLA path (bounded memory, preserves f64).  This is what
    keeps the metrics CSV's ``total_energy`` finite at the flagship
    N=64K..1M scales (round-2 verdict item 6) instead of NaN-ing past a
    dense-intermediate cutoff.
    """
    n = state.masses.shape[0]
    if n <= 4096:
        return potential_energy(state, g)
    if (
        jax.default_backend() == "tpu"
        and state.positions.dtype == jnp.float32
    ):
        from .ops.allpairs import allpairs_potential

        phi = allpairs_potential(state.positions, state.masses, g=g)
        return 0.5 * jnp.sum(state.masses * phi)
    phi = potential_per_body_chunked(state.positions, state.masses, g)
    return 0.5 * jnp.sum(state.masses * phi)


def total_momentum(state: SimState) -> jax.Array:
    return jnp.sum(state.masses[:, None] * state.velocities, axis=0)
