from beso_tpu.sampling.samplers import (
    SAMPLERS,
    get_ancestral_step,
    sample_ddim,
    sample_dpm_2,
    sample_dpm_2_ancestral,
    sample_dpmpp_2m,
    sample_dpmpp_2m_sde,
    sample_dpmpp_2s,
    sample_dpmpp_2s_ancestral,
    sample_dpmpp_sde,
    sample_euler,
    sample_euler_ancestral,
    sample_euler_visualization,
    sample_heun,
    sample_lms,
    sample_loop,
    to_d,
)
from beso_tpu.sampling.dpm_solver import sample_dpm_adaptive, sample_dpm_fast
from beso_tpu.sampling.lms import linear_multistep_coeff, lms_coefficient_matrix
from beso_tpu.sampling.likelihood import log_likelihood
from beso_tpu.sampling.parallel import sample_picard
