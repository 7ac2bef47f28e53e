from beso_tpu.models.gpt import DiffusionGPT, VisionDiffusionGPT
from beso_tpu.models.denoiser import GCDenoiser, denoise, denoiser_loss
from beso_tpu.models.cfg import cfg_denoise_fn
from beso_tpu.models.ema import EmaState, ema_init, ema_update
from beso_tpu.models.scaler import Scaler, fit_scaler, fit_minmax_scaler
from beso_tpu.models.cached import (make_cached_denoise_fn,
                                    make_rollout_denoise_factory)
from beso_tpu.models.fused import make_fused_denoise_fn
