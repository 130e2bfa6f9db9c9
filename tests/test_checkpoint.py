"""Checkpoint/resume: a resumed run must produce the identical trajectory
(strict superset of the reference's init-state persistence, SURVEY.md 5.4).
"""

import numpy as np

from nbody_tpu import SimConfig, make_state
from nbody_tpu.models.simulation import Simulation
from nbody_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 64
    state = make_state(
        (10 ** rng.uniform(-1, 0, n)),
        rng.uniform(-0.1, 0.1, (n, 2)),
        rng.uniform(-1e-4, 1e-4, (n, 2)),
        time=3.0,
        step=3,
    )
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)
    loaded = load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(loaded.positions), np.asarray(state.positions)
    )
    assert float(loaded.time) == 3.0 and int(loaded.step) == 3


def test_resume_continues_identically(tmp_path):
    cfg = SimConfig(n_bodies=128, n_steps=6, engine="naive", seed=5)
    # straight run
    sim = Simulation(cfg)
    full, _ = sim.run_contract()

    # run 3, checkpoint, resume 3
    cfg_a = cfg.replace(
        n_steps=3,
        checkpoint_every=3,
        checkpoint_path=str(tmp_path / "mid.npz"),
    )
    sim_a = Simulation(cfg_a)
    sim_a.run_contract()
    mid = load_checkpoint(str(tmp_path / "mid.npz"))
    assert int(mid.step) == 3
    sim_b = Simulation(cfg.replace(n_steps=3), state=mid)
    resumed, _ = sim_b.run_contract()

    np.testing.assert_array_equal(
        np.asarray(resumed.positions), np.asarray(full.positions)
    )
    assert int(resumed.step) == int(full.step) == 6
