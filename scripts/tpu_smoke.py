"""Quick single-chip TPU smoke + timing for the all-pairs kernel."""

import sys
import time


import jax
import jax.numpy as jnp
import numpy as np

from nbody_tpu.ops.allpairs import allpairs_accelerations
from nbody_tpu.physics import pair_accelerations_dense

print("backend:", jax.default_backend(), jax.devices())

G = 6.67e-11
n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
tb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
sb = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

rng = np.random.default_rng(0)
masses = jnp.asarray(10 ** rng.uniform(-1, np.log10(0.5), n), jnp.float32)
positions = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 2)), jnp.float32)

acc = allpairs_accelerations(
    positions, masses, g=G, target_block=tb, source_block=sb
)
acc.block_until_ready()

# correctness vs dense on a subsample
if n <= 8192:
    want = pair_accelerations_dense(positions, masses, g=G)
    err = float(jnp.abs(acc - want).max() / jnp.abs(want).max())
    print(f"max rel err vs dense: {err:.2e}")

reps = 20
t0 = time.perf_counter()
for _ in range(reps):
    acc = allpairs_accelerations(
        positions, masses, g=G, target_block=tb, source_block=sb
    )
acc.block_until_ready()
dt = (time.perf_counter() - t0) / reps
pairs = float(n) * n
print(
    f"N={n} tb={tb} sb={sb}: {dt*1e3:.3f} ms/iter, "
    f"{pairs/dt/1e9:.2f} Gpairs/s"
)
