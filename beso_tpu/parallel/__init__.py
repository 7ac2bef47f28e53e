from beso_tpu.parallel.mesh import (
    make_mesh,
    partition_batch,
    partition_params,
    replicate,
    tp_param_spec,
)
