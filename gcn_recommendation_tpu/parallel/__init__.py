from gcn_recommendation_tpu.parallel.spmd import (
    ShardedTrainer,
    sharded_topk_eval_batch,
    shard_params,
)

__all__ = ["ShardedTrainer", "sharded_topk_eval_batch", "shard_params"]
