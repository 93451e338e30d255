from .sharded import (
    make_mesh,
    sharded_retrieval_step,
    shard_tables,
)
