from .memory import choose_bh_mode, per_chip_bytes, source_bytes, tree_bytes
from .mesh import make_mesh, make_mesh_2d, shard_state
from .steps import STEP_BUILDERS, make_sharded_step

__all__ = [
    "STEP_BUILDERS",
    "choose_bh_mode",
    "make_mesh",
    "make_mesh_2d",
    "make_sharded_step",
    "per_chip_bytes",
    "shard_state",
    "source_bytes",
    "tree_bytes",
]
