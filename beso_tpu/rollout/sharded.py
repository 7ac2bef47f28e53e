"""dp-sharded serving rollouts via shard_map (multi-device fused engine).

Under plain `jit` with dp-sharded inputs XLA cannot partition a
`pallas_call`, so the fused Pallas serving engine (models/fused.py) was
previously hard-gated to one device. The multi-device path here wraps the
WHOLE rollout in `shard_map` over the mesh's data axes: each device executes
its own pallas_call on its env shard. Per-shard shapes are identical to the
single-chip shapes, so the kernel itself is unchanged, and the per-episode
prefix-KV cache is built per shard inside the shard_map region (each shard
caches only its own episodes' goals).

This is the code path behind the v5e-8 north-star projection
(BASELINE.json): the rollout is embarrassingly parallel over envs — zero
cross-device collectives inside the scan; the only sharded-ness is the env
batch itself. The reference has no analogue (strictly single-process,
sequential episodes — SURVEY.md §5.8).

Validated by tests/test_sharded_rollout.py on the virtual 8-device CPU mesh
(Pallas in interpret mode) and by the driver's `dryrun_multichip`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

def _shard_map(body, mesh, in_specs, out_specs):
    """jax.shard_map across API generations: `check_vma` (jax >= 0.7) vs
    the older `check_rep` keyword. Value-checking is disabled because the
    scalar `env_steps` output is per-shard-computed (provably replicated,
    but not by the checker)."""
    try:
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)

from beso_tpu.parallel.mesh import data_axes
from beso_tpu.rollout.rollout import (RolloutMetrics, rollout_block_push,
                                      rollout_kitchen)


def _fold_shard_key(key, axes):
    """Distinct per-shard RNG stream: fold each data-axis index into the key.

    Deterministic in (key, shard index) — two engines run under the same
    mesh and key see identical reset/rollout noise, which is what the
    sharded engine-parity tests compare.
    """
    for ax in axes:
        key = jax.random.fold_in(key, jax.lax.axis_index(ax))
    return key


def _sharded(rollout_fn, mesh, goals, expected, key, n_steps, kw,
             sharded_kw=()):
    """Run `rollout_fn` under shard_map with the env batch sharded over the
    mesh's data axes. `sharded_kw` names entries of `kw` whose leading dim is
    the env batch (sharded alongside goals/expected); everything else is
    closed over (replicated)."""
    axes = data_axes(mesh)
    spec = P(axes)
    n_shards = 1
    for ax in axes:
        n_shards *= mesh.shape[ax]
    B = expected.shape[0]
    if B % n_shards:
        raise ValueError(f"env batch {B} not divisible by {n_shards} shards")

    extra_names = [k for k in sharded_kw if kw.get(k) is not None]
    extra_vals = [jnp.asarray(kw.pop(k)) for k in extra_names]

    def body(goals_s, expected_s, key, *extra):
        k = _fold_shard_key(key, axes)
        return rollout_fn(goals=goals_s, expected=expected_s, key=k,
                          n_steps=n_steps,
                          **dict(zip(extra_names, extra)), **kw)

    out_specs = RolloutMetrics(rewards=spec, results=spec, completed=spec,
                               env_steps=P(), completion_order=spec)
    f = _shard_map(body, mesh=mesh,
                   in_specs=(spec, spec, P()) + (spec,) * len(extra_vals),
                   out_specs=out_specs)
    m = f(jnp.asarray(goals), jnp.asarray(expected), key, *extra_vals)
    # per-shard env_steps counts only the shard's envs; restate the total
    return m._replace(env_steps=jnp.asarray(B * n_steps))


def rollout_kitchen_sharded(denoise_fn, scaler, cfg, goals, expected, key,
                            mesh, n_steps: int = 280, physics_params=None,
                            init_qpos=None, denoise_factory=None
                            ) -> RolloutMetrics:
    """`rollout_kitchen` with the env batch sharded over the mesh's data
    axes. Works with every inference engine including 'fused_cached': the
    pallas_call runs per device on its shard."""

    def fn(goals, expected, key, n_steps, init_qpos=None):
        return rollout_kitchen(denoise_fn, scaler, cfg, goals, expected, key,
                               n_steps=n_steps, physics_params=physics_params,
                               init_qpos=init_qpos,
                               denoise_factory=denoise_factory)

    return _sharded(fn, mesh, goals, expected, key, n_steps,
                    kw=dict(init_qpos=init_qpos), sharded_kw=("init_qpos",))


def rollout_block_push_sharded(denoise_fn, scaler, cfg, goal_frames, expected,
                               key, mesh, n_steps: int = 300,
                               goal_seq_len: int = 1,
                               reduce_obs_dim: bool = True,
                               mask_targets: bool = False,
                               denoise_factory=None) -> RolloutMetrics:
    """`rollout_block_push` sharded over the mesh's data axes (the
    goal_frames [B, 16] shard with the env batch; the flip-fixed goals are
    built per shard from the shard's own live resets)."""

    def fn(goals, expected, key, n_steps):
        return rollout_block_push(denoise_fn, scaler, cfg, goals, expected,
                                  key, n_steps=n_steps,
                                  goal_seq_len=goal_seq_len,
                                  reduce_obs_dim=reduce_obs_dim,
                                  mask_targets=mask_targets,
                                  denoise_factory=denoise_factory)

    return _sharded(fn, mesh, goal_frames, expected, key, n_steps, kw={})
