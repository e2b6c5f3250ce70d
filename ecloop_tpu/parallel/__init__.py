from .mesh import make_mesh, ShardedAddSearch, sharded_step_builder  # noqa: F401
