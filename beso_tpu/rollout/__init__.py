from beso_tpu.rollout.rollout import (
    RolloutMetrics,
    rollout_block_push,
    rollout_kitchen,
    success_rate_histogram,
)
from beso_tpu.rollout.sharded import (
    rollout_block_push_sharded,
    rollout_kitchen_sharded,
)
