from .sharded import (
    make_mesh,
    shard_model_tables,
    sharded_retrieval_step,
    build_flagship_sharded,
)
