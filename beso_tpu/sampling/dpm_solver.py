"""DPM-Solver (Lu et al. 2022, arXiv 2206.00927): fixed-fast and adaptive.

Functional parity targets: the `DPMSolver` class, `sample_dpm_fast` and
`sample_dpm_adaptive` + `PIDStepSizeController`
(`beso/agents/diffusion_agents/k_diffusion/gc_sampling.py:498-699,855-892`).

TPU-first design:
* solver steps operate in t = -log(sigma) space like the reference,
* `sample_dpm_fast` has a STATIC order plan (a python-level unrolled loop —
  the plan depends only on the requested NFE, a compile-time constant),
* `sample_dpm_adaptive` is a `lax.while_loop` whose carry holds the PID
  controller state (step size h, last three inverse errors) — the reference's
  python while loop with host-side floats becomes a single compiled program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from beso_tpu.sampling.samplers import get_ancestral_step

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _sigma(t):
    return jnp.exp(-t)


def _t(sigma):
    return -jnp.log(sigma)


def _eps(denoise_fn, x, t):
    """eps(x, t) = (x - D(x, sigma(t))) / sigma(t) (gc_sampling.py:543-550)."""
    sig = _sigma(t)
    s_in = jnp.ones((x.shape[0],), jnp.float32)
    return (x - denoise_fn(x, sig * s_in)) / sig


def dpm_solver_1_step(denoise_fn, x, t, t_next, eps=None):
    h = t_next - t
    eps = _eps(denoise_fn, x, t) if eps is None else eps
    return x - _sigma(t_next) * jnp.expm1(h) * eps, eps


def dpm_solver_2_step(denoise_fn, x, t, t_next, r1=0.5, eps=None):
    h = t_next - t
    eps = _eps(denoise_fn, x, t) if eps is None else eps
    s1 = t + r1 * h
    u1 = x - _sigma(s1) * jnp.expm1(r1 * h) * eps
    eps_r1 = _eps(denoise_fn, u1, s1)
    x2 = (x - _sigma(t_next) * jnp.expm1(h) * eps
          - _sigma(t_next) / (2 * r1) * jnp.expm1(h) * (eps_r1 - eps))
    return x2, eps, eps_r1


def dpm_solver_3_step(denoise_fn, x, t, t_next, r1=1 / 3, r2=2 / 3,
                      eps=None, eps_r1=None):
    h = t_next - t
    eps = _eps(denoise_fn, x, t) if eps is None else eps
    s1 = t + r1 * h
    s2 = t + r2 * h
    if eps_r1 is None:
        u1 = x - _sigma(s1) * jnp.expm1(r1 * h) * eps
        eps_r1 = _eps(denoise_fn, u1, s1)
    u2 = (x - _sigma(s2) * jnp.expm1(r2 * h) * eps
          - _sigma(s2) * (r2 / r1) * (jnp.expm1(r2 * h) / (r2 * h) - 1)
          * (eps_r1 - eps))
    eps_r2 = _eps(denoise_fn, u2, s2)
    x3 = (x - _sigma(t_next) * jnp.expm1(h) * eps
          - _sigma(t_next) / r2 * (jnp.expm1(h) / h - 1) * (eps_r2 - eps))
    return x3, eps


def sample_dpm_fast(denoise_fn: DenoiseFn, x, sigma_min,
                    sigma_max, n: int, key=None, *, eta: float = 0.0,
                    s_noise: float = 1.0):
    """DPM-Solver-Fast with a fixed NFE budget (gc_sampling.py:582-619,675-699).

    `sigma_min`/`sigma_max` may be Python floats OR traced scalars: the
    order plan depends only on `n` (static), so the whole sampler is
    jittable and can run inside the fused rollout like the fixed-grid
    samplers (VERDICT r3 #10)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    t_start = _t(jnp.asarray(sigma_max, jnp.float32))
    t_end = _t(jnp.asarray(sigma_min, jnp.float32))
    m = n // 3 + 1
    ts = t_start + (t_end - t_start) * (jnp.arange(m + 1, dtype=jnp.float32)
                                        / m)
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [n % 3]

    for i, order in enumerate(orders):
        t, t_next = jnp.asarray(ts[i]), jnp.asarray(ts[i + 1])
        if eta:
            sd, su = get_ancestral_step(_sigma(t), _sigma(t_next), eta)
            t_next_ = jnp.minimum(t_end, _t(sd))
            su = jnp.sqrt(jnp.maximum(
                _sigma(t_next) ** 2 - _sigma(t_next_) ** 2, 0.0))
        else:
            t_next_, su = t_next, 0.0

        if order == 1:
            x, _ = dpm_solver_1_step(denoise_fn, x, t, t_next_)
        elif order == 2:
            x, _, _ = dpm_solver_2_step(denoise_fn, x, t, t_next_)
        else:
            x, _ = dpm_solver_3_step(denoise_fn, x, t, t_next_)

        if eta:
            noise = jax.random.normal(jax.random.fold_in(key, i), x.shape)
            x = x + su * s_noise * noise
    return x


def sample_dpm_adaptive(
    denoise_fn: DenoiseFn,
    x,
    sigma_min: float,
    sigma_max: float,
    key=None,
    *,
    order: int = 3,
    rtol: float = 0.05,
    atol: float = 0.0078,
    h_init: float = 0.05,
    pcoeff: float = 0.0,
    icoeff: float = 1.0,
    dcoeff: float = 0.0,
    accept_safety: float = 0.81,
    eta: float = 0.0,
    s_noise: float = 1.0,
    max_steps: int = 1000,
    return_info: bool = False,
):
    """DPM-Solver-12/23 with PID step-size control
    (gc_sampling.py:498-524,621-672,855-892) as a `lax.while_loop`."""
    if order not in (2, 3):
        raise ValueError("order should be 2 or 3")
    if isinstance(sigma_min, (int, float)) and sigma_min <= 0:
        raise ValueError("sigma_min and sigma_max must not be 0")
    if isinstance(sigma_max, (int, float)) and sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must not be 0")
    key = key if key is not None else jax.random.PRNGKey(0)
    # traced-scalar friendly (jittable), same values as -math.log for floats
    t_start = _t(jnp.asarray(sigma_max, jnp.float32))
    t_end = _t(jnp.asarray(sigma_min, jnp.float32))
    pid_order = 1.5 if eta else order
    b1 = (pcoeff + icoeff + dcoeff) / pid_order
    b2 = -(pcoeff + 2 * dcoeff) / pid_order
    b3 = dcoeff / pid_order
    eps_c = 1e-8
    numel = float(x.size)

    # carry: (x, x_prev, s, h, errs[3], errs_init, n_accept, n_reject, i, key)
    def cond(carry):
        _, _, s, _, _, _, _, _, i, _ = carry
        return jnp.logical_and(s < t_end - 1e-5, i < max_steps)

    def body(carry):
        x, x_prev, s, h, errs, errs_init, n_acc, n_rej, i, key = carry
        t = jnp.minimum(t_end, s + h)
        if eta:
            sd, su = get_ancestral_step(_sigma(s), _sigma(t), eta)
            t_ = jnp.minimum(t_end, _t(sd))
            su = jnp.sqrt(jnp.maximum(_sigma(t) ** 2 - _sigma(t_) ** 2, 0.0))
        else:
            t_, su = t, 0.0

        eps0 = _eps(denoise_fn, x, s)
        if order == 2:
            x_low, _ = dpm_solver_1_step(denoise_fn, x, s, t_, eps=eps0)
            x_high, _, _ = dpm_solver_2_step(denoise_fn, x, s, t_, eps=eps0)
        else:
            x_low, _, eps_r1 = dpm_solver_2_step(denoise_fn, x, s, t_,
                                                 r1=1 / 3, eps=eps0)
            x_high, _ = dpm_solver_3_step(denoise_fn, x, s, t_, eps=eps0,
                                          eps_r1=eps_r1)

        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(x_prev)))
        error = jnp.linalg.norm((x_low - x_high) / delta) / numel ** 0.5

        inv_error = 1.0 / (error + eps_c)
        errs0 = jnp.where(errs_init, errs, jnp.full(3, inv_error))
        errs0 = errs0.at[0].set(inv_error)
        factor = errs0[0] ** b1 * errs0[1] ** b2 * errs0[2] ** b3
        factor = 1.0 + jnp.arctan(factor - 1.0)  # PID limiter
        accept = factor >= accept_safety
        errs_new = jnp.where(accept,
                             jnp.stack([errs0[0], errs0[0], errs0[1]]), errs0)
        h_new = h * factor

        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape) if eta else 0.0
        x_acc = x_high + su * s_noise * noise
        x_next = jnp.where(accept, x_acc, x)
        x_prev_next = jnp.where(accept, x_low, x_prev)
        s_next = jnp.where(accept, t, s)
        return (x_next, x_prev_next, s_next, h_new, errs_new,
                jnp.asarray(True), n_acc + accept.astype(jnp.int32),
                n_rej + (1 - accept.astype(jnp.int32)), i + 1, key)

    carry0 = (x, x, jnp.asarray(t_start), jnp.asarray(abs(h_init)),
              jnp.zeros(3), jnp.asarray(False), jnp.zeros((), jnp.int32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), key)
    out = jax.lax.while_loop(cond, body, carry0)
    x_final = out[0]
    if return_info:
        info = {"n_accept": out[6], "n_reject": out[7], "steps": out[8]}
        return x_final, info
    return x_final
