"""Random initial conditions.

Reproduces the reference's distributions (project.cu:80-101):

* masses: log-uniform — 10 ** U(log10(lo), log10(hi))   (generateLogRandom)
* positions / velocities: uniform U(lo, hi)              (generateRandom)

The reference seeds ``std::rand`` with wall-clock time (project.cu:1051) and
the GPU path seeds one cuRAND state per body (project.cu:219-228); here a
counter-based JAX PRNG key gives bit-reproducible init for any (seed, N)
independent of device count or layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import InitRanges, SimConfig
from .state import SimState, make_state


def log_uniform(key, shape, lower: float, higher: float, dtype=jnp.float32):
    """10 ** U(log10(lower), log10(higher)) — reference generateLogRandom
    (project.cu:99-101)."""
    lo = jnp.log10(jnp.asarray(lower, dtype=jnp.float32))
    hi = jnp.log10(jnp.asarray(higher, dtype=jnp.float32))
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    return jnp.power(10.0, lo + u * (hi - lo)).astype(dtype)


def uniform(key, shape, lower: float, higher: float, dtype=jnp.float32):
    """U(lower, higher) — reference generateRandom (project.cu:80-82)."""
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    return (lower + u * (higher - lower)).astype(dtype)


def random_state(config: SimConfig) -> SimState:
    """Fresh random bodies per the configured ranges (initializeCpu /
    initializeGpu, project.cu:298-341).

    ``init_mode``:

    * ``"uniform"`` — the reference's distribution (positions and
      velocities U(lo, hi), masses log-uniform).
    * ``"blobs"`` — two dense Gaussian clusters (sigma = 2% of the
      position range) inside the same domain: the collapsed-state
    	distribution used to calibrate every traversal cap in this repo
      (PERF.md); the reference has no analogue — exposed so the
      worst-case perf/overflow claims are user-reproducible.
    """
    dtype = config.jnp_dtype()
    n = config.n_bodies
    r: InitRanges = config.init
    k_m, k_p, k_v, k_c = jax.random.split(
        jax.random.PRNGKey(config.seed), 4
    )
    dims = getattr(config, "n_dim", 2)
    masses = log_uniform(k_m, (n,), r.lower_m, r.higher_m, dtype)
    mode = getattr(config, "init_mode", "uniform")
    if mode == "blobs":
        span = r.higher_p - r.lower_p
        centers = uniform(
            k_c, (2, dims), r.lower_p + 0.25 * span,
            r.higher_p - 0.25 * span, dtype,
        )
        which = (jnp.arange(n) % 2)[:, None]
        noise = 0.02 * span * jax.random.normal(
            k_p, (n, dims), dtype=jnp.float32
        ).astype(dtype)
        positions = jnp.where(which == 0, centers[0], centers[1]) + noise
        # Clipping can in principle pin two bodies to the same corner
        # coordinates, which the d2 > 0 guard would then treat as
        # self-pairs (no mutual force).  Practically unreachable:
        # centers are confined to the central 50% and sigma is 2% of the
        # span, so a clipped body needs a >12.5-sigma noise draw.
        positions = jnp.clip(positions, r.lower_p, r.higher_p)
    elif mode == "uniform":
        positions = uniform(k_p, (n, dims), r.lower_p, r.higher_p, dtype)
    else:
        raise ValueError(f"unknown init_mode {mode!r}")
    velocities = uniform(k_v, (n, dims), r.lower_v, r.higher_v, dtype)
    return make_state(masses, positions, velocities, dtype=dtype)
