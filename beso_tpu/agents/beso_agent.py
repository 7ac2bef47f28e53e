"""High-level BESO agent: config, training, prediction, weight I/O.

Functional parity target: `BesoAgent`
(`beso/agents/diffusion_agents/beso_agent.py:28-598`) — the central class
bundling model + optimizer + LR schedule + EMA + sigma density + sampler
selection + rolling-context prediction.

TPU-first design: the class is a thin orchestration shell; all compute lives
in pure functions (beso_tpu.train.trainer, beso_tpu.agents.policy,
beso_tpu.sampling). State is an explicit TrainState pytree.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from beso_tpu.agents.policy import PolicyConfig, policy_predict, policy_reset
from beso_tpu.core.densities import make_sample_density
from beso_tpu.models.denoiser import GCDenoiser
from beso_tpu.models.gpt import DiffusionGPT
from beso_tpu.models.scaler import Scaler
from beso_tpu.train.trainer import TrainState, Trainer, make_optimizer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class BesoAgentConfig:
    """Union of the reference's agent + model config knobs
    (configs/agents/beso_*.yaml, configs/agents/model/diffusion_gpt.yaml)."""

    # model (diffusion_gpt.yaml)
    obs_dim: int = 30
    action_dim: int = 9
    goal_dim: Optional[int] = None
    hidden_dim: int = 360
    n_layers: int = 6
    n_heads: int = 6
    goal_seq_len: int = 2          # future_seq_length
    window_size: int = 4           # obs_seq_len
    goal_conditioned: bool = True
    embed_pdrob: float = 0.0
    attn_pdrop: float = 0.3
    resid_pdrop: float = 0.0
    cond_mask_prob: float = 0.0    # goal_drop
    linear_output: bool = True
    attention: str = "auto"  # 'auto' | 'broadcast' | 'pallas' (models/gpt.py)
    # diffusion (beso_*.yaml)
    sampler_type: str = "ddim"
    num_sampling_steps: int = 3
    sigma_data: float = 0.5
    sigma_min: float = 0.005
    sigma_max: float = 1.0
    rho: float = 5.0
    noise_scheduler: str = "exponential"
    sigma_sample_density_type: str = "loglogistic"
    sigma_sample_density_mean: float = -0.6
    sigma_sample_density_std: float = 1.6
    # training
    optimizer: str = "adamw"
    lr: float = 1e-4
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 0.01     # torch AdamW default, kitchen config
    lr_step_size: int = 100
    lr_gamma: float = 0.99
    max_train_steps: int = 40000
    eval_every_n_steps: int = 4000
    train_batch_size: int = 1024
    use_ema: bool = True
    decay: float = 0.999
    update_ema_every_n_steps: int = 1
    pred_last_action_only: bool = False
    # inference
    cond_lambda: float = 1.0
    compute_dtype: str = "float32"  # 'bfloat16' for MXU-friendly training
    inference_engine: str = "auto"  # 'auto' | 'cached' | 'full' (see
    #                                 make_denoise_factory / models/cached.py)


class BesoAgent:
    def __init__(self, config: BesoAgentConfig, scaler: Scaler,
                 checkpoint_dir: Optional[str] = None, metrics_writer=None):
        self.cfg = config
        self.scaler = scaler
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        self.model = DiffusionGPT(
            state_dim=config.obs_dim,
            action_dim=config.action_dim,
            goal_dim=config.goal_dim,
            embed_dim=config.hidden_dim,
            n_layers=config.n_layers,
            n_heads=config.n_heads,
            goal_seq_len=config.goal_seq_len,
            obs_seq_len=config.window_size,
            goal_conditioned=config.goal_conditioned,
            embed_pdrob=config.embed_pdrob,
            attn_pdrop=config.attn_pdrop,
            resid_pdrop=config.resid_pdrop,
            cond_mask_prob=config.cond_mask_prob,
            linear_output=config.linear_output,
            attention=config.attention,
            dtype=dtype,
        )
        self.denoiser = GCDenoiser(self.model, sigma_data=config.sigma_data)
        self.optimizer = make_optimizer(
            config.optimizer, config.lr, config.betas, config.weight_decay,
            config.lr_step_size, config.lr_gamma)
        self.sample_density = make_sample_density(
            config.sigma_sample_density_type, config.sigma_data,
            config.sigma_min, config.sigma_max,
            loc=config.sigma_sample_density_mean
            if config.sigma_sample_density_type == "lognormal" else None,
            scale=config.sigma_sample_density_std
            if config.sigma_sample_density_type == "lognormal" else None)
        self.trainer = Trainer(
            denoiser=self.denoiser,
            optimizer=self.optimizer,
            sample_density=self.sample_density,
            scaler=scaler,
            max_train_steps=config.max_train_steps,
            eval_every_n_steps=config.eval_every_n_steps,
            ema_decay=config.decay,
            update_ema_every_n_steps=config.update_ema_every_n_steps,
            num_sampling_steps=config.num_sampling_steps,
            sigma_min=config.sigma_min,
            sigma_max=config.sigma_max,
            sampler_type=config.sampler_type,
            use_ema=config.use_ema,
            cond_mask_prob=config.cond_mask_prob,
            pred_last_action_only=config.pred_last_action_only,
            checkpoint_dir=checkpoint_dir,
            metrics_writer=metrics_writer,
        )
        self.state: Optional[TrainState] = None

    # -- lifecycle ---------------------------------------------------------
    def init(self, key, sample_batch: dict) -> TrainState:
        self.state = self.trainer.init_state(key, sample_batch)
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        log.info("The model has a total amount of %d parameters", n_params)
        return self.state

    def train_agent(self, train_ds, test_ds, key,
                    batch_size: Optional[int] = None,
                    train_method: str = "steps", max_epochs: int = 100,
                    patience: int = 80) -> TrainState:
        """Step- or epoch-based training (beso_agent.py:119-213)."""
        bs = batch_size or self.cfg.train_batch_size

        def test_batches():
            return test_ds.epoch_batches(min(bs, max(len(test_ds), 1)))

        if train_method == "epochs":
            self.state = self.trainer.train_on_epochs(
                self.state, train_ds, test_batches, key, max_epochs,
                batch_size=bs, patience=patience)
        elif train_method == "steps":
            self.state = self.trainer.train(self.state, train_ds,
                                            test_batches, key, batch_size=bs)
        else:
            raise ValueError("Either epochs or n_steps must be specified!")
        return self.state

    # -- inference ---------------------------------------------------------
    def eval_params(self):
        assert self.state is not None
        return self.state.ema.params if self.cfg.use_ema else self.state.params

    def make_denoise_fn(self, params=None):
        params = self.eval_params() if params is None else params
        return partial(self.denoiser.apply, params)

    def make_denoise_factory(self, policy_cfg: PolicyConfig, params=None):
        """Per-episode denoise-fn factory for the fused rollouts, or None.

        `inference_engine` config knob: 'auto' (default) uses the prefix-KV
        cached engine (models/cached.py, ~10% rollout speedup) whenever the
        policy config is eligible (grid-sigma sampler, no churn, single
        action sample) and silently falls back to the full forward
        otherwise; 'cached' requires eligibility (raises if not);
        'fused_cached' additionally runs the suffix tokens through the
        fused Pallas layers (models/fused.py; multi-device serving wraps
        the rollout in shard_map — rollout/sharded.py);
        'full' always uses the plain flax forward.
        """
        engine = self.cfg.inference_engine
        if engine == "full":
            return None
        from beso_tpu.models.cached import make_rollout_denoise_factory

        params = self.eval_params() if params is None else params
        try:
            return make_rollout_denoise_factory(
                self.denoiser, params, self.scaler, policy_cfg,
                engine="fused_cached" if engine == "fused_cached"
                else "cached")
        except (ValueError, NotImplementedError):
            if engine == "cached":
                raise
            return None  # auto: ineligible sampler/config -> full forward

    def policy_config(self, **overrides) -> PolicyConfig:
        base = dict(
            window_size=self.cfg.window_size,
            obs_dim=self.cfg.obs_dim,
            action_dim=self.cfg.action_dim,
            sampler_type=self.cfg.sampler_type,
            num_sampling_steps=self.cfg.num_sampling_steps,
            sigma_min=self.cfg.sigma_min,
            sigma_max=self.cfg.sigma_max,
            sigma_data=self.cfg.sigma_data,
            rho=self.cfg.rho,
            noise_scheduler=self.cfg.noise_scheduler,
            cond_lambda=self.cfg.cond_lambda,
        )
        base.update({k: v for k, v in overrides.items() if v is not None})
        return PolicyConfig(**base)

    def reset(self, batch_size: int, policy_cfg: Optional[PolicyConfig] = None):
        """Clear rolling contexts (beso_agent.py:291-294)."""
        return policy_reset(batch_size, policy_cfg or self.policy_config())

    def predict(self, pstate, obs, goal, key,
                policy_cfg: Optional[PolicyConfig] = None, extra_args=None):
        """One batched control step (beso_agent.py:296-388)."""
        cfg = policy_cfg or self.policy_config()
        return policy_predict(self.make_denoise_fn(), self.scaler, pstate,
                              obs, goal, key, cfg, extra_args)

    def visualize_ode(self, state, goal, key, get_mean: int = 1000,
                      new_sampling_steps: Optional[int] = None,
                      noise_scheduler: Optional[str] = None):
        """Debug utility (beso_agent.py:478-538): repeat a single (state,
        goal) `get_mean` times and record the action after EVERY denoise step
        of a step-wise DDIM trajectory. Returns [n_steps+1, get_mean, act]."""
        from beso_tpu.core.schedules import get_noise_schedule
        from beso_tpu.sampling.samplers import sample_ddim

        cfg = self.cfg
        n = new_sampling_steps or cfg.num_sampling_steps
        sched = noise_scheduler or cfg.noise_scheduler
        sigmas = get_noise_schedule(n, cfg.sigma_min, cfg.sigma_max, cfg.rho,
                                    sched)
        state_s = self.scaler.scale_input(state)
        goal_s = self.scaler.scale_input(goal)
        state_rpt = jnp.repeat(state_s, get_mean, axis=0)
        goal_rpt = jnp.repeat(goal_s, get_mean, axis=0)
        x = jax.random.normal(key, (get_mean, state.shape[-2] if state.ndim > 2
                                    else 1, cfg.action_dim)) * cfg.sigma_max
        denoise = self.make_denoise_fn()

        def dn(actions, sigma):
            return denoise(state_rpt, actions, goal_rpt, sigma)

        samples = [x]
        for i in range(n):
            x = sample_ddim(dn, x, sigmas[i:i + 2], key)
            samples.append(x)
        return jnp.stack(samples)

    # -- weight I/O ----------------------------------------------------------
    def store_model_weights(self, store_path: str):
        """Store full train state (EMA included) — supersedes the reference's
        bare state-dict dump (beso_agent.py:466-476)."""
        from beso_tpu.train.checkpoint import save_train_state

        save_train_state(self.state, store_path, "train_state")

    def load_pretrained_model(self, weights_path: str):
        from beso_tpu.train.checkpoint import restore_train_state

        assert self.state is not None, "call init() first to build a template"
        self.state = restore_train_state(self.state, weights_path, "train_state")
        log.info("Loaded pre-trained model parameters")

    def load_torch_checkpoint(self, weights_path: str,
                              filename: str = "model_state_dict.pth"):
        """Import a reference .pth checkpoint (beso_agent.py:458-464)."""
        from beso_tpu.train.checkpoint import load_torch_checkpoint

        params = load_torch_checkpoint(weights_path, self.cfg.n_layers, filename)
        assert self.state is not None
        from beso_tpu.models.ema import ema_init

        self.state = self.state._replace(params=params, ema=ema_init(params))
