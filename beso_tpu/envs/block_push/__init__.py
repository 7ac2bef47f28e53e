from beso_tpu.envs.block_push.env import (
    BlockPushState,
    block_push_obs,
    block_push_reset,
    block_push_step,
)
