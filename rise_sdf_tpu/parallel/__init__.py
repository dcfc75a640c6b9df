from .sharding import get_mesh, make_sharded_train_step  # noqa: F401
