"""beso_tpu — a TPU-native goal-conditioned score-based diffusion policy framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of
intuitive-robots/beso (RSS 2023, "Goal-Conditioned Imitation Learning using
Score-based Diffusion Policies"):

* continuous-time Karras-EDM diffusion policies over interleaved
  state/action token sequences (noise-conditioned causal GPT),
* a full ODE/SDE sampler suite (Euler, Heun, DDIM, DPM / DPM++ families,
  ancestral + SDE variants, linear multistep, adaptive DPM),
* classifier-free guidance training + sampling,
* batched, fully device-resident robot environments (Franka Kitchen,
  Block Push Multimodal) so a complete goal-conditioned rollout
  (denoise loop fused with env.step) runs as one jit'd `lax.scan`
  across thousands of parallel environments,
* training (EMA, sigma sample densities, optax) with data pipelines for
  the relay-kitchen and multimodal block-push datasets,
* evaluation workspaces reproducing the reference's success metrics and
  comparison studies (samplers x steps, CFG lambda, SDE churn, ...).

Design stance (vs. the torch reference, see SURVEY.md):
  functional core, explicit RNG keys, batch-first everywhere, samplers as
  `lax.scan` bodies, `shard_map`/pjit over a `jax.sharding.Mesh` for
  multi-chip scaling, physics in JAX instead of MuJoCo/PyBullet.
"""

__version__ = "0.1.0"
