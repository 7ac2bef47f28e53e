"""ODE/SDE samplers for Karras-EDM diffusion policies, as `lax.scan` bodies.

Functional parity targets: the 15 `sample_*` functions of the reference
(`beso/agents/diffusion_agents/k_diffusion/gc_sampling.py`), which are
python-loop torch code. Here every fixed-grid sampler is a single fused
`lax.scan` over the sigma grid (one compiled program, no host round-trips),
so a 3-step denoise loop vmapped over 4096 environments is one XLA call.

Conventions:
* `denoise_fn(x, sigma_vec) -> denoised` closes over params/states/goals
  (build it from GCDenoiser.apply + functools.partial, or cfg_denoise_fn).
* `sigmas` is a descending grid with an appended terminal zero, shape [n+1]
  (see beso_tpu.core.schedules); it is a compile-time constant.
* `key` is an explicit jax.random key; deterministic samplers ignore it.
* Stochastic draws use `jax.random.fold_in(key, step)` — the TPU-native
  replacement for the reference's torchsde BrownianTree noise
  (gc_sampling.py:117-164): per-interval unit-variance gaussians keyed by the
  static step index. Marginal distributions match; the tree's cross-step-count
  coupling (a variance-reduction nicety) is not reproduced.
* `clip_fn` optionally clamps the action after every update, mirroring the
  reference's `scaler.clip_output` hook (e.g. pass `scaler.clip_action`).

Sampler math is implemented from the published algorithms (Karras et al. 2022
Algorithm 2; Lu et al. DPM-Solver / DPM-Solver++; Song et al. DDIM), with the
reference's exact step rules as the parity contract (see tests/test_samplers).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from beso_tpu.core.precond import append_dims
from beso_tpu.sampling.lms import lms_coefficient_matrix

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
ClipFn = Optional[Callable[[jnp.ndarray], jnp.ndarray]]

_INV_SQRT2M1 = 2 ** 0.5 - 1


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """Denoiser output -> Karras ODE derivative (gc_sampling.py:98-100)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    """sigma_down/sigma_up split for an ancestral step (gc_sampling.py:107-114)."""
    if not eta:
        return sigma_to, sigma_to * 0.0
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to ** 2 * (sigma_from ** 2 - sigma_to ** 2)
                       / sigma_from ** 2),
    )
    sigma_down = jnp.sqrt(jnp.maximum(sigma_to ** 2 - sigma_up ** 2, 0.0))
    return sigma_down, sigma_up


def _s_in(x):
    return jnp.ones((x.shape[0],), dtype=jnp.float32)


def _bc(sigma, x):
    """Broadcast a scalar sigma to the batch."""
    return sigma * _s_in(x)


def _maybe_clip(x, clip_fn: ClipFn):
    return clip_fn(x) if clip_fn is not None else x


def _churn(x, sigma, n_steps, key, s_churn, s_tmin, s_tmax, s_noise):
    """Langevin-like churn of Karras Algorithm 2 (gc_sampling.py:198-203)."""
    if s_churn == 0.0:
        return x, sigma
    gamma_val = min(s_churn / n_steps, _INV_SQRT2M1)
    gamma = jnp.where((s_tmin <= sigma) & (sigma <= s_tmax), gamma_val, 0.0)
    sigma_hat = sigma * (gamma + 1.0)
    eps = jax.random.normal(key, x.shape) * s_noise
    bump = eps * jnp.sqrt(jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0))
    x = jnp.where(gamma > 0, x + bump, x)
    return x, sigma_hat


# ---------------------------------------------------------------------------
# first-order ODE / ancestral
# ---------------------------------------------------------------------------

def sample_euler(denoise_fn: DenoiseFn, x, sigmas, key=None, *, s_churn=0.0,
                 s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0,
                 clip_fn: ClipFn = None):
    """Karras Algorithm 2 Euler variant w/ optional churn (gc_sampling.py:167-213)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        x, sigma_hat = _churn(x, sigma, n, jax.random.fold_in(key, i),
                              s_churn, s_tmin, s_tmax, s_noise)
        denoised = denoise_fn(x, _bc(sigma_hat, x))
        d = to_d(x, sigma_hat, denoised)
        x = x + d * (sigma_next - sigma_hat)
        return _maybe_clip(x, clip_fn), None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


def sample_euler_visualization(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                               s_churn=0.0, s_tmin=0.0, s_tmax=float("inf"),
                               s_noise=1.0, clip_fn: ClipFn = None):
    """Euler sampler that also returns the intermediate action trajectory
    (gc_sampling.py:1019-1073). Returns (x0, xs[n, ...])."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        x, sigma_hat = _churn(x, sigma, n, jax.random.fold_in(key, i),
                              s_churn, s_tmin, s_tmax, s_noise)
        denoised = denoise_fn(x, _bc(sigma_hat, x))
        x = x + to_d(x, sigma_hat, denoised) * (sigma_next - sigma_hat)
        x = _maybe_clip(x, clip_fn)
        return x, x

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, xs = jax.lax.scan(body, x, steps)
    return x, xs


def sample_euler_ancestral(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                           eta=1.0, clip_fn: ClipFn = None):
    """Ancestral sampling with Euler steps (gc_sampling.py:216-256)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta)
        d = to_d(x, sigma, denoised)
        x = x + d * (sigma_down - sigma)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        x = jnp.where(sigma_down > 0, x + noise * sigma_up, x)
        return _maybe_clip(x, clip_fn), None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


# ---------------------------------------------------------------------------
# second-order ODE (Heun / DPM-2) — scan the first n-1 steps, Euler epilogue
# ---------------------------------------------------------------------------

def _euler_epilogue(denoise_fn, x, sigma, key, s_churn, s_tmin, s_tmax,
                    s_noise, n, clip_fn):
    """Final sigma -> 0 Euler step shared by the 2nd-order samplers."""
    x, sigma_hat = _churn(x, sigma, n, key, s_churn, s_tmin, s_tmax, s_noise)
    denoised = denoise_fn(x, _bc(sigma_hat, x))
    x = x + to_d(x, sigma_hat, denoised) * (0.0 - sigma_hat)
    return _maybe_clip(x, clip_fn)


def sample_heun(denoise_fn: DenoiseFn, x, sigmas, key=None, *, s_churn=0.0,
                s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0,
                clip_fn: ClipFn = None):
    """Karras Algorithm 2 with 2nd-order correction (gc_sampling.py:259-314).
    NFE = 2n - 1 (the last step is Euler, like the reference)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        x, sigma_hat = _churn(x, sigma, n, jax.random.fold_in(key, i),
                              s_churn, s_tmin, s_tmax, s_noise)
        denoised = denoise_fn(x, _bc(sigma_hat, x))
        d = to_d(x, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        x_2 = x + d * dt
        denoised_2 = denoise_fn(x_2, _bc(sigma_next, x))
        d_2 = to_d(x_2, sigma_next, denoised_2)
        x = x + (d + d_2) / 2 * dt
        return _maybe_clip(x, clip_fn), None

    if n > 1:
        steps = (jnp.arange(n - 1), sigmas[:-2], sigmas[1:-1])
        x, _ = jax.lax.scan(body, x, steps)
    return _euler_epilogue(denoise_fn, x, sigmas[n - 1],
                           jax.random.fold_in(key, n - 1),
                           s_churn, s_tmin, s_tmax, s_noise, n, clip_fn)


def sample_dpm_2(denoise_fn: DenoiseFn, x, sigmas, key=None, *, s_churn=0.0,
                 s_tmin=0.0, s_tmax=float("inf"), s_noise=1.0,
                 clip_fn: ClipFn = None):
    """DPM-Solver-2-inspired midpoint sampler (gc_sampling.py:317-375)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        x, sigma_hat = _churn(x, sigma, n, jax.random.fold_in(key, i),
                              s_churn, s_tmin, s_tmax, s_noise)
        denoised = denoise_fn(x, _bc(sigma_hat, x))
        d = to_d(x, sigma_hat, denoised)
        # geometric midpoint in log-sigma (gc_sampling.py:366)
        sigma_mid = jnp.exp((jnp.log(sigma_hat) + jnp.log(sigma_next)) / 2)
        dt_1 = sigma_mid - sigma_hat
        dt_2 = sigma_next - sigma_hat
        x_2 = x + d * dt_1
        denoised_2 = denoise_fn(x_2, _bc(sigma_mid, x))
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        x = x + d_2 * dt_2
        return _maybe_clip(x, clip_fn), None

    if n > 1:
        steps = (jnp.arange(n - 1), sigmas[:-2], sigmas[1:-1])
        x, _ = jax.lax.scan(body, x, steps)
    return _euler_epilogue(denoise_fn, x, sigmas[n - 1],
                           jax.random.fold_in(key, n - 1),
                           s_churn, s_tmin, s_tmax, s_noise, n, clip_fn)


def sample_dpm_2_ancestral(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                           eta=1.0, clip_fn: ClipFn = None):
    """Ancestral DPM-Solver-2 (gc_sampling.py:378-413)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x = carry
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta)
        d = to_d(x, sigma, denoised)
        sd_safe = jnp.maximum(sigma_down, 1e-12)
        sigma_mid = jnp.exp((jnp.log(sigma) + jnp.log(sd_safe)) / 2)
        dt_1 = sigma_mid - sigma
        dt_2 = sigma_down - sigma
        x_2 = x + d * dt_1
        denoised_2 = denoise_fn(x_2, _bc(sigma_mid, x))
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        x_mid = x + d_2 * dt_2 + noise * sigma_up
        x_eul = x + d * dt_2
        x = jnp.where(sigma_down > 0, x_mid, x_eul)
        return _maybe_clip(x, clip_fn), None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


# ---------------------------------------------------------------------------
# linear multistep
# ---------------------------------------------------------------------------

def sample_lms(denoise_fn: DenoiseFn, x, sigmas, key=None, *, order: int = 4,
               clip_fn: ClipFn = None):
    """Linear multistep sampler (gc_sampling.py:432-468). The Lagrange-basis
    integrals over the sigma grid are baked in as compile-time constants."""
    n = len(sigmas) - 1
    if isinstance(sigmas, jax.core.Tracer):
        raise TypeError(
            "sample_lms needs a HOST sigma grid (numpy) to precompute the "
            "multistep quadrature coefficients; build it with "
            "beso_tpu.core.schedules (which returns numpy) outside any "
            "traced value flow.")
    coeffs = jnp.asarray(lms_coefficient_matrix(np.asarray(sigmas), order),
                         dtype=x.dtype)
    ds0 = jnp.zeros((order,) + x.shape, dtype=x.dtype)

    def body(carry, inp):
        x, ds = carry
        i, sigma = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        d = to_d(x, sigma, denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)  # newest first
        update = jnp.tensordot(coeffs[i], ds, axes=1)
        x = x + update
        return (_maybe_clip(x, clip_fn), ds), None

    (x, _), _ = jax.lax.scan(body, (x, ds0), (jnp.arange(n), sigmas[:-1]))
    return x


# ---------------------------------------------------------------------------
# DDIM / DPM-Solver++ family (exponential-integrator steps in t = -log sigma)
# ---------------------------------------------------------------------------

def sample_ddim(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                clip_fn: ClipFn = None):
    """DDIM / DPM-Solver-1 (gc_sampling.py:895-924). BESO's default sampler.

    x <- (sigma_next / sigma) * x - expm1(-h) * denoised,
    h = log(sigma) - log(sigma_next); the final step collapses to
    x <- denoised exactly.
    """
    n = len(sigmas) - 1

    def body(x, inp):
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        ratio = sigma_next / sigma
        # expm1(-h) = sigma_next/sigma - 1, computed stably even at 0
        x = ratio * x - (ratio - 1.0) * denoised
        return _maybe_clip(x, clip_fn), None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


def sample_dpmpp_2s(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                    clip_fn: ClipFn = None):
    """DPM-Solver++(2S) (gc_sampling.py:928-967). Final step is Euler."""
    n = len(sigmas) - 1

    def body(x, inp):
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        r = 0.5
        h = t_next - t
        s = t + r * h
        sig_s = jnp.exp(-s)
        x_2 = (sig_s / sigma) * x - jnp.expm1(-h * r) * denoised
        denoised_2 = denoise_fn(x_2, _bc(sig_s, x))
        x = (sigma_next / sigma) * x - jnp.expm1(-h) * denoised_2
        return _maybe_clip(x, clip_fn), None

    if n > 1:
        steps = (jnp.arange(n - 1), sigmas[:-2], sigmas[1:-1])
        x, _ = jax.lax.scan(body, x, steps)
    # Euler final step (gc_sampling.py:951-955)
    sigma = sigmas[n - 1]
    denoised = denoise_fn(x, _bc(sigma, x))
    x = x + to_d(x, sigma, denoised) * (0.0 - sigma)
    return _maybe_clip(x, clip_fn)


def sample_dpmpp_2s_ancestral(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                              eta=1.0, s_noise=1.0, clip_fn: ClipFn = None):
    """Ancestral DPM-Solver++(2S) (gc_sampling.py:970-1016)."""
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(x, inp):
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta)
        sd_safe = jnp.maximum(sigma_down, 1e-12)
        # 2S branch toward sigma_down
        t, t_next = -jnp.log(sigma), -jnp.log(sd_safe)
        r = 0.5
        h = t_next - t
        s = t + r * h
        sig_s = jnp.exp(-s)
        x_2 = (sig_s / sigma) * x - jnp.expm1(-h * r) * denoised
        denoised_2 = denoise_fn(x_2, _bc(sig_s, x))
        x_2s = (sd_safe / sigma) * x - jnp.expm1(-h) * denoised_2
        # Euler branch for the final (sigma_down == 0) step
        x_eul = x + to_d(x, sigma, denoised) * (sigma_down - sigma)
        x = jnp.where(sigma_down > 0, x_2s, x_eul)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        x = x + noise * s_noise * sigma_up
        return _maybe_clip(x, clip_fn), None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


def sample_dpmpp_2m(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                    clip_fn: ClipFn = None):
    """DPM-Solver++(2M) multistep (gc_sampling.py:702-736)."""
    n = len(sigmas) - 1

    def body(carry, inp):
        x, old_denoised, h_last = carry
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        sig_next_safe = jnp.maximum(sigma_next, 1e-20)
        t, t_next = -jnp.log(sigma), -jnp.log(sig_next_safe)
        h = t_next - t
        ratio = sigma_next / sigma
        em = ratio - 1.0  # = expm1(-h), exact at sigma_next == 0
        use_first_order = jnp.logical_or(i == 0, sigma_next == 0)
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        denoised_sel = jnp.where(use_first_order, denoised, denoised_d)
        x = ratio * x - em * denoised_sel
        return (_maybe_clip(x, clip_fn), denoised, h), None

    carry0 = (x, jnp.zeros_like(x), jnp.asarray(1.0, x.dtype))
    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    (x, _, _), _ = jax.lax.scan(body, carry0, steps)
    return x


def sample_dpmpp_sde(denoise_fn: DenoiseFn, x, sigmas, key=None, *, eta=1.0,
                     s_noise=1.0, r=0.5, clip_fn: ClipFn = None):
    """DPM-Solver++ (stochastic) (gc_sampling.py:739-795).

    Interval noise comes from fold_in-keyed gaussians instead of a
    torchsde BrownianTree (same marginals; see module docstring).
    """
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(x, inp):
        x_in = x
        i, sigma, sigma_next = inp
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        denoised = denoise_fn(x, _bc(sigma, x))
        t, t_next = -jnp.log(sigma), -jnp.log(sigma_next)
        h = t_next - t
        s = t + h * r
        fac = 1 / (2 * r)
        sig_s = jnp.exp(-s)

        # Step 1 (to the ancestral-reduced midpoint)
        sd, su = get_ancestral_step(sigma, sig_s, eta)
        s_ = -jnp.log(jnp.maximum(sd, 1e-20))
        x_2 = (jnp.exp(-s_) / sigma) * x - jnp.expm1(t - s_) * denoised
        x_2 = x_2 + jax.random.normal(k1, x.shape) * s_noise * su
        denoised_2 = denoise_fn(x_2, _bc(sig_s, x))

        # Step 2
        sd, su = get_ancestral_step(sigma, sigma_next, eta)
        t_next_ = -jnp.log(jnp.maximum(sd, 1e-20))
        denoised_d = (1 - fac) * denoised + fac * denoised_2
        x = (jnp.exp(-t_next_) / sigma) * x - jnp.expm1(t - t_next_) * denoised_d
        x = x + jax.random.normal(k2, x.shape) * s_noise * su
        x = _maybe_clip(x, clip_fn)

        # final (sigma_next == 0) step is plain Euler (gc_sampling.py:768-772)
        x_eul = x_in + to_d(x_in, sigma, denoised) * (sigma_next - sigma)
        x = jnp.where(sigma_next > 0, x, x_eul)
        return x, None

    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    x, _ = jax.lax.scan(body, x, steps)
    return x


def sample_dpmpp_2m_sde(denoise_fn: DenoiseFn, x, sigmas, key=None, *,
                        eta=1.0, s_noise=1.0, solver_type: str = "heun",
                        clip_fn: ClipFn = None):
    """DPM-Solver++(2M) SDE.

    The reference's version (gc_sampling.py:799-852) is unrunnable as shipped
    (uses an undefined `x`/`noise_sampler`, SURVEY.md 2.3); this implements the
    intended k-diffusion algorithm the code body describes, with fold_in noise.
    """
    if solver_type not in {"heun", "midpoint"}:
        raise ValueError("solver_type must be 'heun' or 'midpoint'")
    n = len(sigmas) - 1
    key = key if key is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        x, old_denoised, h_last, have_old = carry
        i, sigma, sigma_next = inp
        denoised = denoise_fn(x, _bc(sigma, x))
        sig_next_safe = jnp.maximum(sigma_next, 1e-20)
        t, s = -jnp.log(sigma), -jnp.log(sig_next_safe)
        h = s - t
        eta_h = eta * h
        em = -jnp.expm1(-h - eta_h)
        x_new = sigma_next / sigma * jnp.exp(-eta_h) * x + em * denoised
        r = h_last / h
        if solver_type == "heun":
            corr = (em / (-h - eta_h) + 1) * (1 / r) * (denoised - old_denoised)
        else:
            corr = 0.5 * em * (1 / r) * (denoised - old_denoised)
        x_new = x_new + jnp.where(have_old, corr, 0.0)
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
        x_new = x_new + noise * sigma_next * jnp.sqrt(-jnp.expm1(-2 * eta_h)) * s_noise
        x = jnp.where(sigma_next > 0, x_new, denoised)
        return (_maybe_clip(x, clip_fn), denoised, h, jnp.asarray(True)), None

    carry0 = (x, jnp.zeros_like(x), jnp.asarray(1.0, x.dtype), jnp.asarray(False))
    steps = (jnp.arange(n), sigmas[:-1], sigmas[1:])
    (x, _, _, _), _ = jax.lax.scan(body, carry0, steps)
    return x


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def sample_loop(
    sampler_type: str,
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    key=None,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    eta: float = 1.0,
    clip_fn: ClipFn = None,
) -> jnp.ndarray:
    """Named sampler dispatch mirroring BesoAgent.sample_loop
    (beso_agent.py:390-456), including its name->function mapping quirks
    ('ancestral' -> dpm_2_ancestral, 'dpm' -> dpm_2,
     'dpmpp_2m_sde' -> the stochastic dpmpp_sde)."""
    from beso_tpu.sampling.dpm_solver import sample_dpm_adaptive, sample_dpm_fast

    if sampler_type == "lms":
        return sample_lms(denoise_fn, x, sigmas, key, clip_fn=clip_fn)
    if sampler_type == "heun":
        return sample_heun(denoise_fn, x, sigmas, key, s_churn=s_churn,
                           s_tmin=s_tmin, clip_fn=clip_fn)
    if sampler_type == "euler":
        return sample_euler(denoise_fn, x, sigmas, key, s_churn=s_churn,
                            s_tmin=s_tmin, clip_fn=clip_fn)
    if sampler_type == "ancestral":
        return sample_dpm_2_ancestral(denoise_fn, x, sigmas, key, eta=eta,
                                      clip_fn=clip_fn)
    if sampler_type == "euler_ancestral":
        return sample_euler_ancestral(denoise_fn, x, sigmas, key, eta=eta,
                                      clip_fn=clip_fn)
    if sampler_type == "dpm":
        return sample_dpm_2(denoise_fn, x, sigmas, key, s_churn=s_churn,
                            s_tmin=s_tmin, clip_fn=clip_fn)
    if sampler_type == "ddim":
        return sample_ddim(denoise_fn, x, sigmas, key, clip_fn=clip_fn)
    if sampler_type == "dpm_adaptive":
        # traced endpoints: jittable like every other sampler (VERDICT r3 #10)
        return sample_dpm_adaptive(denoise_fn, x, sigmas[-2], sigmas[0], key)
    if sampler_type == "dpm_fast":
        return sample_dpm_fast(denoise_fn, x, sigmas[-2], sigmas[0],
                               len(sigmas), key)
    if sampler_type == "dpmpp_2s_ancestral":
        return sample_dpmpp_2s_ancestral(denoise_fn, x, sigmas, key, eta=eta,
                                         clip_fn=clip_fn)
    if sampler_type == "dpmpp_2s":
        return sample_dpmpp_2s(denoise_fn, x, sigmas, key, clip_fn=clip_fn)
    if sampler_type == "dpmpp_2m":
        return sample_dpmpp_2m(denoise_fn, x, sigmas, key, clip_fn=clip_fn)
    if sampler_type == "dpmpp_2m_sde":
        # reference-quirk parity: BesoAgent.sample_loop maps this name to the
        # stochastic dpmpp_sde (beso_agent.py:443-448) because the reference's
        # own 2M-SDE body is unrunnable. The repaired algorithm is reachable
        # under the distinct name below.
        return sample_dpmpp_sde(denoise_fn, x, sigmas, key, eta=eta,
                                clip_fn=clip_fn)
    if sampler_type == "dpmpp_2m_sde_fixed":
        return sample_dpmpp_2m_sde(denoise_fn, x, sigmas, key, eta=eta,
                                   clip_fn=clip_fn)
    if sampler_type == "dpmpp_sde":
        return sample_dpmpp_sde(denoise_fn, x, sigmas, key, eta=eta,
                                clip_fn=clip_fn)
    raise ValueError(f"desired sampler type not found: {sampler_type!r}")


SAMPLERS = (
    "lms", "heun", "euler", "ancestral", "euler_ancestral", "dpm", "ddim",
    "dpm_adaptive", "dpm_fast", "dpmpp_2s_ancestral", "dpmpp_2s", "dpmpp_2m",
    "dpmpp_2m_sde", "dpmpp_sde", "dpmpp_2m_sde_fixed",
)
