"""Golden parity tests against the ACTUAL reference code at /root/reference.

These import the reference modules directly (with lightweight stubs for the
deps absent from this image: hydra, omegaconf, torchsde, torchdiffeq, gym)
and assert numerical agreement with the beso_tpu implementations:

* all 8 sigma-schedule grids        (gc_sampling.py:22-95)
* EDM preconditioner scalings + loss (score_wrappers.py:18-99)
* every deterministic sampler's full trajectory on a shared mock denoiser
  (gc_sampling.py:167-468, 675-736, 895-1016)
* DiffusionGPT forward through the torch->flax weight converter
  (score_gpts.py:118-374)
* Scaler / MinMaxScaler outputs      (scaler_class.py:11-338)
* TrajectorySlicerDataset slice-index sets + goal-window semantics
  (trajectory_loader.py:79-197)
* sigma sample densities, distributionally via KS tests (utils.py:173-220)
"""

import itertools
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_reference():
    """Make /root/reference/beso importable with stub deps (idempotent)."""
    if "torchsde" not in sys.modules:
        m = types.ModuleType("torchsde")
        m.BrownianTree = type("BrownianTree", (), {})
        sys.modules["torchsde"] = m
    if "torchdiffeq" not in sys.modules:
        m = types.ModuleType("torchdiffeq")
        m.odeint = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub"))
        sys.modules["torchdiffeq"] = m
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hutils = types.ModuleType("hydra.utils")
        # reference GCDenoiser calls hydra.utils.instantiate(inner_model);
        # in these tests we always pass an already-built nn.Module through.
        hutils.instantiate = lambda cfg, *a, **k: cfg
        hutils.call = lambda cfg, *a, **k: cfg
        hydra.utils = hutils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = hutils
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.DictConfig = dict
        oc.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf"] = oc
    if "gym" not in sys.modules:
        gym = types.ModuleType("gym")
        envs = types.ModuleType("gym.envs")
        reg = types.ModuleType("gym.envs.registration")
        reg.register = lambda *a, **k: None
        envs.registration = reg
        gym.envs = envs
        sys.modules["gym"] = gym
        sys.modules["gym.envs"] = envs
        sys.modules["gym.envs.registration"] = reg
    def _passthrough_dec(*a, **k):
        if a and (callable(a[0]) or isinstance(a[0], type)):
            return a[0]
        return lambda f: f

    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")
        gin.configurable = _passthrough_dec
        gin.constants_from_enum = _passthrough_dec
        sys.modules["gin"] = gin
    # gym stub (installed above) needs Env/spaces for block_pushing.py
    gym = sys.modules["gym"]
    if not hasattr(gym, "Env"):
        gym.Env = type("Env", (), {})
        spaces = types.ModuleType("gym.spaces")
        spaces.Box, spaces.Dict, spaces.Discrete = object, dict, object
        gym.spaces = spaces
        sys.modules["gym.spaces"] = spaces
        sys.modules["gym.envs.registration"].registry = types.SimpleNamespace(
            env_specs={})
    if "pybullet" not in sys.modules:
        pb = types.ModuleType("pybullet")
        for i, kname in enumerate(["DIRECT", "GUI", "SHARED_MEMORY",
                                   "JOINT_REVOLUTE", "JOINT_PRISMATIC",
                                   "JOINT_FIXED"]):
            setattr(pb, kname, i)
        sys.modules["pybullet"] = pb
        bc = types.ModuleType("pybullet_utils.bullet_client")
        bc.BulletClient = object
        pu = types.ModuleType("pybullet_utils")
        pu.bullet_client = bc
        sys.modules["pybullet_utils"] = pu
        sys.modules["pybullet_utils.bullet_client"] = bc
        pd = types.ModuleType("pybullet_data")
        pd.getDataPath = lambda: "/tmp"
        sys.modules["pybullet_data"] = pd
    import torch._utils as tu
    if not hasattr(tu, "_accumulate"):  # removed in newer torch
        tu._accumulate = lambda it: itertools.accumulate(it)
    if REF not in sys.path:
        # append (not prepend): the reference also has a top-level scripts/
        # dir that would otherwise shadow the repo's `scripts` package
        sys.path.append(REF)


_install_reference()

import beso.agents.diffusion_agents.k_diffusion.gc_sampling as ref_gcs  # noqa: E402
import beso.agents.diffusion_agents.k_diffusion.score_gpts as ref_sg  # noqa: E402
import beso.agents.diffusion_agents.k_diffusion.score_wrappers as ref_sw  # noqa: E402
import beso.agents.diffusion_agents.k_diffusion.utils as ref_ku  # noqa: E402
import beso.envs.dataloaders.trajectory_loader as ref_tl  # noqa: E402
import beso.networks.scaler.scaler_class as ref_sc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beso_tpu.core import schedules as my_sched  # noqa: E402
from beso_tpu.core.precond import edm_scalings  # noqa: E402
from beso_tpu.models import denoiser as my_den  # noqa: E402
from beso_tpu.models.scaler import fit_minmax_scaler, fit_scaler  # noqa: E402
from beso_tpu.sampling import samplers as my_smp  # noqa: E402


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------

SCHEDULE_CASES = [
    ("karras", lambda n: ref_gcs.get_sigmas_karras(n, 0.005, 1.0, rho=5.0),
     lambda n: my_sched.get_sigmas_karras(n, 0.005, 1.0, rho=5.0)),
    ("karras7", lambda n: ref_gcs.get_sigmas_karras(n, 0.05, 80.0),
     lambda n: my_sched.get_sigmas_karras(n, 0.05, 80.0)),
    ("exponential", lambda n: ref_gcs.get_sigmas_exponential(n, 0.005, 1.0),
     lambda n: my_sched.get_sigmas_exponential(n, 0.005, 1.0)),
    ("linear", lambda n: ref_gcs.get_sigmas_linear(n, 0.05, 1.0),
     lambda n: my_sched.get_sigmas_linear(n, 0.05, 1.0)),
    ("cosine_beta", lambda n: ref_gcs.cosine_beta_schedule(n),
     lambda n: my_sched.cosine_beta_schedule(n)),
    ("ve", lambda n: ref_gcs.get_sigmas_ve(n, 0.02, 100.0),
     lambda n: my_sched.get_sigmas_ve(n, 0.02, 100.0)),
    ("iddpm", lambda n: ref_gcs.get_iddpm_sigmas(n, 0.02, 100.0),
     lambda n: my_sched.get_iddpm_sigmas(n, 0.02, 100.0)),
    ("vp", lambda n: ref_gcs.get_sigmas_vp(n),
     lambda n: my_sched.get_sigmas_vp(n)),
    ("polyexp", lambda n: ref_gcs.get_sigmas_polyexponential(n, 0.005, 1.0, rho=2.0),
     lambda n: my_sched.get_sigmas_polyexponential(n, 0.005, 1.0, rho=2.0)),
]


@pytest.mark.parametrize("name,ref_fn,my_fn", SCHEDULE_CASES,
                         ids=[c[0] for c in SCHEDULE_CASES])
@pytest.mark.parametrize("n", [3, 10, 50])
def test_schedule_parity(name, ref_fn, my_fn, n):
    ref = ref_fn(n).cpu().numpy()
    mine = np.asarray(my_fn(n))
    # atol floor: the iddpm recursion amplifies torch-vs-numpy libm sin ulp
    # differences into ~1e-6 absolute on the smallest grid entries
    np.testing.assert_allclose(mine, ref, rtol=2e-6, atol=5e-6)


# ---------------------------------------------------------------------------
# preconditioner
# ---------------------------------------------------------------------------

def test_scalings_parity():
    den = ref_sw.GCDenoiser(torch.nn.Identity(), sigma_data=0.5)
    sig_t = torch.tensor([0.005, 0.05, 0.5, 1.0, 80.0], dtype=torch.float64)
    ref = den.get_scalings(sig_t)
    mine = edm_scalings(jnp.asarray(sig_t.numpy()), 0.5)
    for r, m in zip(ref, mine):
        np.testing.assert_allclose(np.asarray(m), r.numpy(), rtol=1e-6)


class _TorchMockInner(torch.nn.Module):
    """Smooth closed-form 'denoiser' exercising the full (s, a, g, sigma)
    signature, reproducible exactly in jax."""

    def forward(self, state, action, goal, sigma, **kw):
        s = sigma.reshape(-1, 1, 1)
        return (action / (1.0 + s ** 2)
                + 0.1 * state.mean(-1, keepdim=True)
                + 0.05 * goal.mean(dim=(1, 2)).reshape(-1, 1, 1))


def _jax_mock_denoise(state, goal):
    state = jnp.asarray(state)
    goal = jnp.asarray(goal)

    def fn(x, sigma):
        s = sigma.reshape(-1, 1, 1)
        return (x / (1.0 + s ** 2)
                + 0.1 * jnp.mean(state, -1, keepdims=True)
                + 0.05 * jnp.mean(goal, axis=(1, 2)).reshape(-1, 1, 1))

    return fn


def _mock_data(B=4, T=3, obs=6, act=2, G=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(B, T, obs)).astype(np.float32),
            rng.normal(size=(B, T, act)).astype(np.float32),
            rng.normal(size=(B, G, obs)).astype(np.float32))


def test_denoiser_loss_parity():
    state, action, goal = _mock_data()
    noise = np.random.default_rng(1).normal(size=action.shape).astype(np.float32)
    sigma = np.array([0.01, 0.1, 0.7, 2.0], dtype=np.float32)

    inner_t = _TorchMockInner()
    ref_den = ref_sw.GCDenoiser(inner_t, sigma_data=0.5)

    def inner_apply(params, s, a, g, sig, **kw):
        del params
        s_ = sig.reshape(-1, 1, 1)
        return (a / (1.0 + s_ ** 2)
                + 0.1 * jnp.mean(s, -1, keepdims=True)
                + 0.05 * jnp.mean(g, axis=(1, 2)).reshape(-1, 1, 1))

    for pred_last in (False, True):
        ref_loss = ref_den.loss(
            torch.tensor(state), torch.tensor(action), torch.tensor(goal),
            torch.tensor(noise.copy()), torch.tensor(sigma),
            pred_last_action_only=pred_last)
        my_loss = my_den.denoiser_loss(
            inner_apply, None, jnp.asarray(state), jnp.asarray(action),
            jnp.asarray(goal), jnp.asarray(noise), jnp.asarray(sigma),
            sigma_data=0.5, pred_last_action_only=pred_last)
        np.testing.assert_allclose(float(my_loss), float(ref_loss),
                                   rtol=1e-5, atol=1e-7)


def test_denoiser_forward_parity():
    state, action, goal = _mock_data()
    sigma = np.array([0.05, 0.3, 1.0, 5.0], dtype=np.float32)
    ref_den = ref_sw.GCDenoiser(_TorchMockInner(), sigma_data=0.5)
    ref_out = ref_den(torch.tensor(state), torch.tensor(action),
                      torch.tensor(goal), torch.tensor(sigma))

    def inner_apply(params, s, a, g, sig, **kw):
        del params
        s_ = sig.reshape(-1, 1, 1)
        return (a / (1.0 + s_ ** 2)
                + 0.1 * jnp.mean(s, -1, keepdims=True)
                + 0.05 * jnp.mean(g, axis=(1, 2)).reshape(-1, 1, 1))

    mine = my_den.denoise(inner_apply, None, jnp.asarray(state),
                          jnp.asarray(action), jnp.asarray(goal),
                          jnp.asarray(sigma), sigma_data=0.5)
    np.testing.assert_allclose(np.asarray(mine), ref_out.numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# samplers: full sigma-trajectory agreement on the shared mock denoiser
# ---------------------------------------------------------------------------

def _wrap_ref_model():
    inner = _TorchMockInner()
    den = ref_sw.GCDenoiser(inner, sigma_data=0.5)

    def model(state, action, goal, sigma, **kw):
        return den(state, action, goal, sigma)

    return model


def _jax_den(state, goal):
    mock = _jax_mock_denoise(state, goal)
    c = 0.5

    def fn(x, sigma):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        c_skip = c ** 2 / (s ** 2 + c ** 2)
        c_out = s * c / jnp.sqrt(s ** 2 + c ** 2)
        c_in = 1.0 / jnp.sqrt(s ** 2 + c ** 2)
        return mock(x * c_in, sigma) * c_out + x * c_skip

    return fn


# (name, ref callable, mine callable); all deterministic configurations
SAMPLER_CASES = [
    ("euler", lambda m, s, a, g, sg: ref_gcs.sample_euler(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_euler(f, x, sg)),
    ("euler_ancestral_eta0",
     lambda m, s, a, g, sg: ref_gcs.sample_euler_ancestral(m, s, a, g, sg, disable=True, eta=0.0),
     lambda f, x, sg: my_smp.sample_euler_ancestral(f, x, sg, eta=0.0)),
    ("heun", lambda m, s, a, g, sg: ref_gcs.sample_heun(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_heun(f, x, sg)),
    ("dpm_2", lambda m, s, a, g, sg: ref_gcs.sample_dpm_2(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_dpm_2(f, x, sg)),
    ("dpm_2_ancestral_eta0",
     lambda m, s, a, g, sg: ref_gcs.sample_dpm_2_ancestral(m, s, a, g, sg, disable=True, eta=0.0),
     lambda f, x, sg: my_smp.sample_dpm_2_ancestral(f, x, sg, eta=0.0)),
    ("lms", lambda m, s, a, g, sg: ref_gcs.sample_lms(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_lms(f, x, sg)),
    ("ddim", lambda m, s, a, g, sg: ref_gcs.sample_ddim(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_ddim(f, x, sg)),
    ("dpmpp_2s", lambda m, s, a, g, sg: ref_gcs.sample_dpmpp_2s(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_dpmpp_2s(f, x, sg)),
    ("dpmpp_2s_ancestral_eta0",
     lambda m, s, a, g, sg: ref_gcs.sample_dpmpp_2s_ancestral(m, s, a, g, sg, disable=True, eta=0.0),
     lambda f, x, sg: my_smp.sample_dpmpp_2s_ancestral(f, x, sg, eta=0.0)),
    ("dpmpp_2m", lambda m, s, a, g, sg: ref_gcs.sample_dpmpp_2m(m, s, a, g, sg, disable=True),
     lambda f, x, sg: my_smp.sample_dpmpp_2m(f, x, sg)),
]


@pytest.mark.parametrize("name,ref_fn,my_fn", SAMPLER_CASES,
                         ids=[c[0] for c in SAMPLER_CASES])
@pytest.mark.parametrize("n_steps,sched", [(3, "exponential"), (10, "karras")])
def test_sampler_trajectory_parity(name, ref_fn, my_fn, n_steps, sched):
    state, action, goal = _mock_data(B=4, T=3, obs=6, act=2, G=2, seed=7)
    x0 = np.random.default_rng(11).normal(size=action.shape).astype(np.float32)

    if sched == "exponential":
        sigmas = my_sched.get_sigmas_exponential(n_steps, 0.005, 1.0)
    else:
        sigmas = my_sched.get_sigmas_karras(n_steps, 0.005, 1.0, rho=5.0)

    model = _wrap_ref_model()
    with torch.no_grad():
        ref_out = ref_fn(model, torch.tensor(state), torch.tensor(x0.copy()),
                         torch.tensor(goal), torch.tensor(sigmas))

    fn = _jax_den(state, goal)
    mine = my_fn(fn, jnp.asarray(x0), jnp.asarray(sigmas))
    np.testing.assert_allclose(np.asarray(mine), ref_out.numpy(),
                               rtol=2e-4, atol=2e-5, err_msg=name)


def test_dpm_fast_parity():
    state, action, goal = _mock_data(B=4, T=3, obs=6, act=2, G=2, seed=3)
    x0 = np.random.default_rng(5).normal(size=action.shape).astype(np.float32)
    model = _wrap_ref_model()
    for n in (3, 7):
        with torch.no_grad():
            ref_out = ref_gcs.sample_dpm_fast(
                model, torch.tensor(state), torch.tensor(x0.copy()),
                torch.tensor(goal), 0.005, 1.0, n, disable=True)
        from beso_tpu.sampling.dpm_solver import sample_dpm_fast
        mine = sample_dpm_fast(_jax_den(state, goal), jnp.asarray(x0),
                               0.005, 1.0, n)
        np.testing.assert_allclose(np.asarray(mine), ref_out.numpy(),
                                   rtol=2e-4, atol=2e-5, err_msg=f"n={n}")


# ---------------------------------------------------------------------------
# DiffusionGPT forward through the weight converter
# ---------------------------------------------------------------------------

def _build_ref_gpt(linear_output, n_layers=2, embed=72, heads=3, T=4, G=2,
                   obs=30, act=9):
    m = ref_sg.DiffusionGPT(
        state_dim=obs, device="cpu", goal_conditioned=True, action_dim=act,
        embed_dim=embed, embed_pdrob=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
        n_layers=n_layers, n_heads=heads, goal_seq_len=G, obs_seq_len=T,
        sigma_vocab_size=1, time_embedding_fn=None, goal_drop=0.0,
        linear_output=linear_output)
    m.eval()
    return m


@pytest.mark.parametrize("linear_output", [True, False])
@pytest.mark.parametrize("uncond", [False, True])
def test_diffusion_gpt_forward_parity(linear_output, uncond):
    from beso_tpu.models import DiffusionGPT
    from beso_tpu.train.checkpoint import convert_torch_diffusion_gpt

    torch.manual_seed(0)
    ref_m = _build_ref_gpt(linear_output)
    params = convert_torch_diffusion_gpt(ref_m.state_dict(), n_layers=2)

    my_m = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=72, n_layers=2,
                        n_heads=3, goal_seq_len=2, obs_seq_len=4,
                        linear_output=linear_output, approximate_gelu=False)

    rng = np.random.default_rng(42)
    states = rng.normal(size=(5, 4, 30)).astype(np.float32)
    actions = rng.normal(size=(5, 4, 9)).astype(np.float32)
    goals = rng.normal(size=(5, 2, 30)).astype(np.float32)
    sigma = (rng.uniform(0.01, 1.0, size=(5,))).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_m(torch.tensor(states), torch.tensor(actions),
                        torch.tensor(goals), torch.tensor(sigma),
                        uncond=uncond)
    mine = my_m.apply(params, jnp.asarray(states), jnp.asarray(actions),
                      jnp.asarray(goals), jnp.asarray(sigma), uncond=uncond)
    np.testing.assert_allclose(np.asarray(mine), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gcdenoiser_full_model_parity():
    """End-to-end: reference GCDenoiser(transformer) vs mine with converted
    weights, through the EDM preconditioner (score_wrappers.py:81-96)."""
    from beso_tpu.models import DiffusionGPT, GCDenoiser
    from beso_tpu.train.checkpoint import convert_torch_diffusion_gpt

    torch.manual_seed(1)
    ref_inner = _build_ref_gpt(linear_output=False)
    ref_den = ref_sw.GCDenoiser(ref_inner, sigma_data=0.5)
    params = convert_torch_diffusion_gpt(ref_inner.state_dict(), n_layers=2)

    my_inner = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=72,
                            n_layers=2, n_heads=3, goal_seq_len=2,
                            obs_seq_len=4, linear_output=False,
                            approximate_gelu=False)
    my_den_obj = GCDenoiser(my_inner, sigma_data=0.5)

    rng = np.random.default_rng(9)
    states = rng.normal(size=(3, 4, 30)).astype(np.float32)
    actions = rng.normal(size=(3, 4, 9)).astype(np.float32)
    goals = rng.normal(size=(3, 2, 30)).astype(np.float32)
    sigma = np.array([0.05, 0.4, 1.0], dtype=np.float32)

    with torch.no_grad():
        ref_out = ref_den(torch.tensor(states), torch.tensor(actions),
                          torch.tensor(goals), torch.tensor(sigma))
    mine = my_den_obj.apply(params, jnp.asarray(states), jnp.asarray(actions),
                            jnp.asarray(goals), jnp.asarray(sigma))
    np.testing.assert_allclose(np.asarray(mine), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# scalers
# ---------------------------------------------------------------------------

def test_scaler_parity():
    rng = np.random.default_rng(0)
    x = rng.normal(2.0, 3.0, size=(50, 20, 30)).astype(np.float32)
    y = rng.normal(-1.0, 0.5, size=(50, 20, 9)).astype(np.float32)

    ref = ref_sc.Scaler(x, y, scale_data=True, device="cpu")
    mine = fit_scaler(x, y)

    xt = torch.tensor(rng.normal(size=(7, 30)).astype(np.float32))
    yt = torch.tensor(rng.normal(size=(7, 9)).astype(np.float32))

    np.testing.assert_allclose(np.asarray(mine.scale_input(jnp.asarray(xt.numpy()))),
                               ref.scale_input(xt).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.scale_output(jnp.asarray(yt.numpy()))),
                               ref.scale_output(yt).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mine.inverse_scale_output(jnp.asarray(yt.numpy()))),
        ref.inverse_scale_output(yt).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.y_bounds), ref.y_bounds,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.x_bounds), ref.x_bounds,
                               rtol=1e-5, atol=1e-6)
    big = torch.tensor(rng.normal(0, 10.0, size=(7, 9)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(mine.clip_action(jnp.asarray(big.numpy()))),
                               ref.clip_action(big).numpy(), rtol=1e-5, atol=1e-6)
    # 7-dim kitchen onehot passthrough (scaler_class.py:84-85)
    onehot = torch.eye(7)[:5]
    np.testing.assert_allclose(
        np.asarray(mine.scale_input(jnp.asarray(onehot.numpy()))),
        ref.scale_input(onehot).numpy(), rtol=1e-6)


def test_minmax_scaler_parity():
    rng = np.random.default_rng(1)
    x = rng.normal(0.5, 2.0, size=(40, 25, 16)).astype(np.float32)
    y = rng.uniform(-0.03, 0.03, size=(40, 25, 2)).astype(np.float32)

    ref = ref_sc.MinMaxScaler(x, y, scale_data=True, device="cpu")
    mine = fit_minmax_scaler(x, y)

    xt = torch.tensor(rng.normal(size=(7, 16)).astype(np.float32))
    yt = torch.tensor(rng.uniform(-0.03, 0.03, size=(7, 2)).astype(np.float32))

    np.testing.assert_allclose(np.asarray(mine.scale_input(jnp.asarray(xt.numpy()))),
                               ref.scale_input(xt).numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.scale_output(jnp.asarray(yt.numpy()))),
                               ref.scale_output(yt).numpy(), rtol=1e-4, atol=1e-6)
    scaled = torch.tensor(rng.uniform(-1, 1, size=(7, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mine.inverse_scale_output(jnp.asarray(scaled.numpy()))),
        ref.inverse_scale_output(scaled).numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.y_bounds), ref.y_bounds, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mine.x_bounds), ref.x_bounds,
                               rtol=1e-5, atol=1e-6)
    big = torch.tensor(rng.uniform(-3, 3, size=(7, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(mine.clip_action(jnp.asarray(big.numpy()))),
                               ref.clip_action(big).numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# trajectory slicer
# ---------------------------------------------------------------------------

class _RefTrajDataset(ref_tl.TrajectoryDataset):
    """Minimal reference-conforming trajectory container."""

    def __init__(self, obs, act, lengths):
        self.obs, self.act, self.lengths = obs, act, lengths

    def __len__(self):
        return len(self.lengths)

    def __getitem__(self, i):
        T = self.lengths[i]
        return (torch.tensor(self.obs[i, :T]), torch.tensor(self.act[i, :T]),
                torch.ones(T))

    def get_seq_length(self, i):
        return int(self.lengths[i])

    def get_all_actions(self):
        return torch.tensor(np.concatenate(
            [self.act[i, :T] for i, T in enumerate(self.lengths)]))


def _tiny_traj_data(seed=0, n_traj=4, t_max=25, obs_dim=5, act_dim=2):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(12, t_max + 1, size=n_traj)
    obs = rng.normal(size=(n_traj, t_max, obs_dim)).astype(np.float32)
    act = rng.normal(size=(n_traj, t_max, act_dim)).astype(np.float32)
    return obs, act, lengths


def test_slicer_index_set_parity():
    obs, act, lengths = _tiny_traj_data()
    window = 4
    ref_ds = ref_tl.TrajectorySlicerDataset(
        _RefTrajDataset(obs, act, lengths), window=window,
        future_conditional=True, future_seq_len=2)
    from beso_tpu.data.slicer import make_slices
    mine = make_slices(lengths, window)
    ref_slices = [(i, s) for (i, s, e) in ref_ds.slices]
    assert [tuple(r) for r in mine.tolist()] == ref_slices


def test_slicer_goal_window_semantics():
    """Goal-window selection parity: the random-start RANGE the reference
    draws from (trajectory_loader.py:169-182) matches ours, and the
    deterministic tail/seq_end/zero-fallback paths agree exactly."""
    obs, act, lengths = _tiny_traj_data(seed=2)
    window, G = 4, 2
    base = _RefTrajDataset(obs, act, lengths)

    # (a) random path: capture the reference's randint ranges
    captured = []
    orig_randint = np.random.randint

    def spy(lo, hi=None, *a, **k):
        captured.append((int(lo), int(hi)))
        return orig_randint(lo, hi, *a, **k)

    ref_ds = ref_tl.TrajectorySlicerDataset(base, window=window,
                                            future_conditional=True,
                                            min_future_sep=1, future_seq_len=G)
    np.random.randint = spy
    try:
        for idx in range(len(ref_ds)):
            ref_ds[idx]
    finally:
        np.random.randint = orig_randint

    # every slice with a valid range must have drawn from [end+sep, T-G)
    want = []
    for (i, start, end) in ref_ds.slices:
        lo, hi = end + 1, int(lengths[i]) - G
        if lo < hi:
            want.append((lo, hi))
    assert captured == want  # == my _gather's (lo, hi) formula (slicer.py:88-100)

    # (b) tail path: deterministic — exact equality of goal windows
    from beso_tpu.data.slicer import SlicedDataset
    from beso_tpu.data.trajectories import TrajectoryData

    data = TrajectoryData(observations=obs, actions=act,
                          lengths=np.asarray(lengths))
    for mode in ("tail", "seq_end"):
        ref_m = ref_tl.TrajectorySlicerDataset(
            base, window=window, future_conditional=True, future_seq_len=G,
            only_sample_tail=(mode == "tail"),
            only_sample_seq_end=(mode == "seq_end"))
        my_m = SlicedDataset(data, window=window, future_conditional=True,
                             future_seq_len=G,
                             only_sample_tail=(mode == "tail"),
                             only_sample_seq_end=(mode == "seq_end"))
        idxs = list(range(len(ref_m)))
        batch = my_m.batch_at(np.asarray(idxs), jax.random.PRNGKey(0))
        for j, idx in enumerate(idxs):
            ref_item = ref_m[idx]
            np.testing.assert_allclose(np.asarray(batch["observation"][j]),
                                       ref_item["observation"].numpy(), rtol=1e-6)
            np.testing.assert_allclose(np.asarray(batch["action"][j]),
                                       ref_item["action"].numpy(), rtol=1e-6)
            i, s, e = ref_m.slices[idx]
            T = int(lengths[i])
            if e + 0 < T - G:  # valid range -> deterministic goal
                np.testing.assert_allclose(
                    np.asarray(batch["goal_observation"][j]),
                    ref_item["goal_observation"].numpy(), rtol=1e-6,
                    err_msg=f"{mode} idx={idx}")
            else:  # zero fallback (trajectory_loader.py:183-186)
                np.testing.assert_allclose(
                    np.asarray(batch["goal_observation"][j]), 0.0, atol=0,
                    err_msg=f"{mode} fallback idx={idx}")
                np.testing.assert_allclose(ref_item["goal_observation"].numpy(),
                                           0.0, atol=0)


def test_split_indices_parity():
    """The seeded train/val split must pick index sets identical to the
    reference's get_split_idx (envs/utils.py:6-10) — the 'expected tasks'
    success metric depends on the exact permutation (SURVEY.md 7.3#5)."""
    import beso.envs.utils as ref_envs_utils

    from beso_tpu.data.trajectories import get_split_idx

    for n, frac, seed in [(10, 0.95, 42), (566, 0.95, 42), (100, 0.9, 7)]:
        ref_train, ref_val = ref_envs_utils.get_split_idx(n, seed, frac)
        my_train, my_val = get_split_idx(n, seed, frac)
        assert list(my_train) == list(ref_train)
        assert list(my_val) == list(ref_val)


# ---------------------------------------------------------------------------
# sigma densities (distributional: 2-sample KS against the reference draws)
# ---------------------------------------------------------------------------

DENSITY_CASES = [
    ("log_normal",
     lambda n: ref_ku.rand_log_normal((n,), loc=-1.0, scale=0.6),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_log_normal(
         k, (n,), loc=-1.0, scale=0.6)),
    ("log_logistic",
     lambda n: ref_ku.rand_log_logistic((n,), loc=math.log(0.5), scale=0.5,
                                        min_value=0.005, max_value=1.0),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_log_logistic(
         k, (n,), loc=math.log(0.5), scale=0.5, min_value=0.005, max_value=1.0)),
    ("log_uniform",
     lambda n: ref_ku.rand_log_uniform((n,), 0.005, 1.0),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_log_uniform(
         k, (n,), 0.005, 1.0)),
    ("uniform",
     lambda n: ref_ku.rand_uniform((n,), 0.1, 0.9),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_uniform(
         k, (n,), 0.1, 0.9)),
    ("v_diffusion",
     lambda n: ref_ku.rand_v_diffusion((n,), sigma_data=0.5, min_value=0.005,
                                       max_value=1.0),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_v_diffusion(
         k, (n,), sigma_data=0.5, min_value=0.005, max_value=1.0)),
    ("split_log_normal",
     lambda n: ref_ku.rand_split_log_normal((n,), loc=-0.7, scale_1=0.5, scale_2=1.0),
     lambda k, n: __import__("beso_tpu.core.densities", fromlist=["x"]).rand_split_log_normal(
         k, (n,), loc=-0.7, scale_1=0.5, scale_2=1.0)),
]


@pytest.mark.parametrize("name,ref_fn,my_fn", DENSITY_CASES,
                         ids=[c[0] for c in DENSITY_CASES])
def test_density_distribution_parity(name, ref_fn, my_fn):
    from scipy.stats import ks_2samp

    n = 40000
    torch.manual_seed(123)
    ref_draws = ref_fn(n).numpy()
    my_draws = np.asarray(my_fn(jax.random.PRNGKey(123), n))
    stat, p = ks_2samp(ref_draws, my_draws)
    assert stat < 0.02, f"{name}: KS statistic {stat:.4f} (p={p:.3g})"


# ---------------------------------------------------------------------------
# BlockPushNormalized wrapper (published-stat normalization)
# ---------------------------------------------------------------------------

def test_block_push_normalized_parity():
    """Our normalized obs/action must match the reference's
    BlockPushNormalized.calc_normalized_state / calc_unnormalized_action
    (block_pushing.py:790-1003) on the same underlying state."""
    import collections

    import beso.envs.block_pushing.block_pushing as ref_bp

    from beso_tpu.envs.block_push.single import (denormalize_action,
                                                 normalized_obs,
                                                 single_block_push_reset)

    s = single_block_push_reset(jax.random.PRNGKey(5))
    state = collections.OrderedDict(
        effector_target_translation=np.asarray(s.effector_target, np.float32),
        block_translation=np.asarray(s.block_pos, np.float32),
        block_orientation=np.asarray([float(s.block_yaw), 0, 0], np.float32),
        target_translation=np.asarray(s.target_pos, np.float32),
        target_orientation=np.asarray([float(s.target_yaw), 0, 0], np.float32),
        effector_translation=np.asarray(s.effector, np.float32),
    )
    ref_norm = ref_bp.BlockPushNormalized.calc_normalized_state(state)
    ref_flat = np.concatenate([np.asarray(v) for v in ref_norm.values()])
    np.testing.assert_allclose(np.asarray(normalized_obs(s)), ref_flat,
                               rtol=1e-5, atol=1e-6)

    for a in ([1.0, -1.0], [0.25, 0.5], [-2.0, 3.0]):  # incl. out-of-range
        ref_a = ref_bp.BlockPushNormalized.calc_unnormalized_action(
            np.clip(np.asarray(a, np.float32), -1, 1))
        np.testing.assert_allclose(
            np.asarray(denormalize_action(jnp.asarray(a, jnp.float32))),
            ref_a, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# goal functions (the success metric's inputs) against the reference closures
# ---------------------------------------------------------------------------

def _exported_kitchen(tmp_path):
    from beso_tpu.data.export import export_relay_kitchen
    from beso_tpu.data.trajectories import synthetic_kitchen_data

    data = synthetic_kitchen_data(n_traj=12, t_max=40, seed=3)
    export_relay_kitchen(data, tmp_path)
    return data


def test_kitchen_multigoal_goal_fn_parity(tmp_path):
    """Our precomputed multigoal goals/expected masks must equal the
    reference get_goal_fn('future') closure over the SAME exported dataset
    (franka_kitchen/goals.py:87-93 + the expected-task oracle)."""
    import beso.envs.franka_kitchen.goals as ref_goals

    from beso_tpu.envs.kitchen.goals import multigoal_kitchen_goals

    data = _exported_kitchen(tmp_path)
    seed, frac, G, N = 42, 0.75, 2, 8
    ref_fn = ref_goals.get_goal_fn(str(tmp_path), "future", goal_seq_len=G,
                                   sequential_goal=False, seed=seed,
                                   train_fraction=frac, device="cpu")
    goals, expected = multigoal_kitchen_goals(data, G, N, seed, frac)

    import beso.envs.franka_kitchen.dataloader as ref_dl
    relay = ref_dl.RelayKitchenTrajectoryDataset(str(tmp_path), device="cpu",
                                                 onehot_goals=True)
    train_idx, _ = ref_goals.get_split_idx(len(relay), seed=seed,
                                           train_fraction=frac)
    for i in range(N):
        ref_goal = ref_fn(None, i, 0).cpu().numpy()
        np.testing.assert_allclose(goals[i], ref_goal, rtol=1e-6, atol=1e-7,
                                   err_msg=f"goal {i}")
        # expected tasks = onehot maxima of the goal trajectory
        _, _, _, onehot = relay[train_idx[i]]
        ref_expected = (onehot.max(0).values > 0.5).numpy()
        np.testing.assert_array_equal(expected[i], ref_expected,
                                      err_msg=f"expected {i}")


def test_kitchen_onehot_goal_fn_parity(tmp_path):
    import beso.envs.franka_kitchen.goals as ref_goals

    from beso_tpu.envs.kitchen.goals import onehot_kitchen_goals

    data = _exported_kitchen(tmp_path)
    seed, frac, N = 42, 0.75, 6
    ref_fn = ref_goals.get_goal_fn(str(tmp_path), "onehot", goal_seq_len=1,
                                   sequential_goal=False, seed=seed,
                                   train_fraction=frac, device="cpu")
    table, _ = onehot_kitchen_goals(data, N, seed, frac)
    for i in range(N):
        for frame in (0, 5, 39, 200):  # incl. beyond the trajectory length
            ref_oh = ref_fn(None, i, frame).cpu().numpy().reshape(7)
            np.testing.assert_allclose(
                table[i, min(frame, table.shape[1] - 1)], ref_oh, rtol=1e-6,
                err_msg=f"episode {i} frame {frame}")


def test_block_push_future_goal_fn_parity(tmp_path):
    """Flip-fix + dim-zeroing parity over the same exported dataset
    (block_pushing/data/goals.py:64-82)."""
    import beso.envs.block_pushing.data.goals as ref_goals

    from beso_tpu.data.export import export_multimodal_push
    from beso_tpu.data.trajectories import synthetic_push_data
    from beso_tpu.envs.block_push.goals import (block_push_goal_frames,
                                                build_block_push_goals)

    data = synthetic_push_data(n_traj=10, t_max=30, seed=4)
    export_multimodal_push(data, tmp_path)
    seed, frac, G, N = 42, 0.8, 3, 4
    ref_fn = ref_goals.get_goal_fn(str(tmp_path), "future", goal_seq_len=G,
                                   seed=seed, train_fraction=frac,
                                   zero_goals=True)
    frames, _ = block_push_goal_frames(data, N, seed, frac)

    rng = np.random.default_rng(0)
    for i in range(N):
        for flip in (False, True):
            state = frames[i].copy()
            if flip:  # move target 0 far from the goal's target 0
                state[[10, 11]] = state[[10, 11]] + 0.5
            ref_goal = ref_fn(state, i, 0).cpu().numpy()           # [G, 16]
            mine = np.asarray(build_block_push_goals(
                jnp.asarray(state[None]), jnp.asarray(frames[i][None]), G,
                zero_goals=True, reduce_obs_dim=False))[0]
            np.testing.assert_allclose(mine, ref_goal, rtol=1e-5, atol=1e-6,
                                       err_msg=f"goal {i} flip={flip}")


def test_block_push_onehot_goal_fn_parity(tmp_path):
    """Next-incomplete-task onehot parity (data/goals.py:84-114)."""
    import beso.envs.block_pushing.data.goals as ref_goals

    from beso_tpu.data.export import export_multimodal_push
    from beso_tpu.data.trajectories import synthetic_push_data
    from beso_tpu.envs.block_push.goals import (block_push_onehot_goal,
                                                demo_task_order)

    data = synthetic_push_data(n_traj=10, t_max=30, seed=5)
    export_multimodal_push(data, tmp_path)
    seed, frac, N = 42, 0.8, 4
    ref_fn = ref_goals.get_goal_fn(str(tmp_path), "onehot", goal_seq_len=1,
                                   seed=seed, train_fraction=frac)
    order = demo_task_order(data, N, seed, frac)

    rng = np.random.default_rng(1)
    for i in range(N):
        # fresh state: nothing done
        state = rng.normal(0.0, 0.3, size=16).astype(np.float32)
        # ensure no block-target pair is accidentally 'done'
        state[[10, 11]] = [5.0, 5.0]
        state[[13, 14]] = [-5.0, -5.0]
        ref_oh = ref_fn(state, i, 0).cpu().numpy()
        mine = np.asarray(block_push_onehot_goal(
            jnp.asarray(state[None]), jnp.asarray(order[i][None])))[0]
        np.testing.assert_allclose(mine, ref_oh, err_msg=f"fresh {i}")

        # complete the first demonstrated task: block b onto target t
        first = int(order[i][0])
        b, t = divmod(first, 2)
        done_state = state.copy()
        bidx = [0, 1] if b == 0 else [3, 4]
        tidx = [10, 11] if t == 0 else [13, 14]
        done_state[tidx] = [0.2, 0.2]
        done_state[bidx] = [0.21, 0.2]  # within 0.05
        ref_oh = ref_fn(done_state, i, 1).cpu().numpy()
        mine = np.asarray(block_push_onehot_goal(
            jnp.asarray(done_state[None]), jnp.asarray(order[i][None])))[0]
        np.testing.assert_allclose(mine, ref_oh, err_msg=f"done {i}")
