from beso_tpu.parallel.mesh import (
    data_axes,
    make_mesh,
    make_multislice_mesh,
    partition_batch,
    partition_params,
    replicate,
    tp_param_spec,
)
