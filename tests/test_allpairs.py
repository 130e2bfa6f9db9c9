"""Tiled Pallas all-pairs kernel vs dense XLA vs f64 oracle.

On non-TPU backends the kernel runs in interpreter mode (the TPU analogue
of the reference validating GPU against CPU, checkEqual project.cu:1027).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nbody_tpu.models import oracle
from nbody_tpu.ops.allpairs import allpairs_accelerations
from nbody_tpu.physics import pair_accelerations_dense

G = 6.67e-11
INTERPRET = jax.default_backend() != "tpu"


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    masses = 10 ** rng.uniform(-1, np.log10(0.5), size=n)
    positions = rng.uniform(-0.1, 0.1, size=(n, 2))
    return masses.astype(np.float32), positions.astype(np.float32)


@pytest.mark.parametrize("n", [700, 1024, 1536])
def test_kernel_matches_dense(n):
    """Kernel == dense XLA (same dtype) including ragged/padded sizes."""
    masses, positions = _cloud(n)
    got = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions),
            jnp.asarray(masses),
            g=G,
            target_block=256,
            source_block=512,
            interpret=INTERPRET,
        )
    )
    want = np.asarray(
        pair_accelerations_dense(
            jnp.asarray(positions), jnp.asarray(masses), g=G
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-11)


def test_kernel_matches_oracle_f64():
    """Kernel (f32) within error budget of the f64 reference semantics."""
    masses, positions = _cloud(1024, seed=3)
    want = oracle.naive_accelerations(positions, masses, g=G)
    got = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions),
            jnp.asarray(masses),
            g=G,
            interpret=INTERPRET,
        )
    )
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)


def test_softened_variant():
    """softening=eps reproduces the BH pair factoring exactly."""
    masses, positions = _cloud(1024, seed=5)
    eps = 1e-3  # large enough to be visible in f32
    got = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions),
            jnp.asarray(masses),
            g=G,
            softening=eps,
            interpret=INTERPRET,
        )
    )
    want = np.asarray(
        pair_accelerations_dense(
            jnp.asarray(positions), jnp.asarray(masses), g=G, softening=eps
        )
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-11)
    # and it must differ from the unsoftened result
    unsoft = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions), jnp.asarray(masses), g=G,
            interpret=INTERPRET,
        )
    )
    assert np.abs(got - unsoft).max() > 0


def test_coincident_bodies_finite():
    """Distinct bodies at identical positions: documented deviation — the
    kernel yields 0 mutual force instead of the reference's inf/NaN."""
    masses = np.ones(600, dtype=np.float32)
    positions = np.zeros((600, 2), dtype=np.float32)
    positions[2:] = np.random.default_rng(0).uniform(-0.1, 0.1, (598, 2))
    got = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions),
            jnp.asarray(masses),
            g=G,
            target_block=256,
            source_block=512,
            interpret=INTERPRET,
        )
    )
    assert np.isfinite(got).all()


def test_compensated_accumulation_agrees():
    """compensated=True (Kahan cross-tile + chunked within-tile) must stay
    within the plain kernel's error budget vs the f64 oracle.  Measured:
    XLA/Mosaic tree-reductions already bound the f32 accumulation error
    at ~log(n)*eps, so the option buys no *measurable* accuracy on this
    stack (documented in PERF.md with numbers) — this test pins the
    semantics so the flag stays correct."""
    masses, positions = _cloud(2048, seed=5)
    truth = oracle.naive_accelerations(
        positions.astype(np.float64), masses.astype(np.float64), g=G
    )
    kw = dict(
        g=G, target_block=256, source_block=512, interpret=INTERPRET
    )
    plain = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions), jnp.asarray(masses), **kw
        )
    )
    comp = np.asarray(
        allpairs_accelerations(
            jnp.asarray(positions), jnp.asarray(masses),
            compensated=True, **kw
        )
    )
    scale = np.linalg.norm(truth, axis=1) + 1e-30
    e_plain = np.median(np.linalg.norm(plain - truth, axis=1) / scale)
    e_comp = np.median(np.linalg.norm(comp - truth, axis=1) / scale)
    assert e_comp < 1e-5
    assert e_comp <= e_plain * 1.5  # never meaningfully worse
    # the two paths agree to f32 rounding of the same quantity
    assert np.abs(plain - comp).max() <= 1e-5 * np.abs(truth).max() + 1e-30
