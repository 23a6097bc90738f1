from simka_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    shard_instances_by_hash,
    sharded_count_join_stats,
)
