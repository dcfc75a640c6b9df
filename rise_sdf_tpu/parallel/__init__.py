from .sharding import (  # noqa: F401
    get_mesh,
    initialize_distributed,
    is_main_process,
    make_sharded_train_step,
    per_device_rngs,
)
