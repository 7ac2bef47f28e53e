from beso_tpu.rollout.rollout import (
    RolloutMetrics,
    rollout_block_push,
    rollout_kitchen,
    success_rate_histogram,
)
