from beso_tpu.envs.kitchen.env import (
    KitchenState,
    kitchen_obs,
    kitchen_reset,
    kitchen_step,
)
from beso_tpu.envs.kitchen.fk import panda_fk
