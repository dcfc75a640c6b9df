from .sharding import (  # noqa: F401
    current_table_sharding,
    data_shard_count,
    get_mesh,
    initialize_distributed,
    is_main_process,
    make_sharded_train_step,
    per_device_rngs,
    table_shard_count,
    table_sharding,
    table_specs,
)
