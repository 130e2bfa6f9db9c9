from .mesh import make_mesh, make_mesh_2d, shard_state
from .steps import STEP_BUILDERS, make_sharded_step

__all__ = [
    "STEP_BUILDERS",
    "make_mesh",
    "make_mesh_2d",
    "make_sharded_step",
    "shard_state",
]
