from beso_tpu.core.precond import append_dims, edm_scalings
from beso_tpu.core.schedules import (
    append_zero,
    cosine_beta_schedule,
    get_iddpm_sigmas,
    get_noise_schedule,
    get_sigmas_exponential,
    get_sigmas_karras,
    get_sigmas_linear,
    get_sigmas_polyexponential,
    get_sigmas_ve,
    get_sigmas_vp,
)
from beso_tpu.core.densities import (
    make_sample_density,
    rand_discrete,
    rand_log_logistic,
    rand_log_normal,
    rand_log_uniform,
    rand_split_log_normal,
    rand_uniform,
    rand_v_diffusion,
)
