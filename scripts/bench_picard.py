"""Picard-vs-sequential wall clock at the action-chunking config (r3 #9).

The round-3 study measured Picard parallel sampling at the BESO-scale model
(11 tokens) where every denoise call is launch-overhead-bound and the fully
folded Picard grid (NFE x batch) costs more than the sequential-depth
reduction saves. This script settles the engine's "pays when denoise calls
are compute-bound" claim with data at the 131-token chunked config
(configs/franka_kitchen_chunked.yaml: window 64, G+2T+1 tokens, flash
attention): wall-clock per control step for sequential DDIM at 50 NFE vs
Picard K sweeps, at serving batch sizes.

Timing per CLAUDE.md: >= R reps amortized inside one jit (lax.scan), host
sync via scalar fetch, ~28 ms tunnel round trip subtracted.

Run (TPU): python scripts/bench_picard.py [--batch 4] [--nfe 50]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

TUNNEL_MS = 28.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--nfe", type=int, default=50)
    parser.add_argument("--window", type=int, default=64)
    parser.add_argument("--reps", type=int, default=10)
    args = parser.parse_args(argv)

    from beso_tpu.core.schedules import get_noise_schedule
    from beso_tpu.models import DiffusionGPT, GCDenoiser
    from beso_tpu.sampling.parallel import sample_picard
    from beso_tpu.sampling.samplers import sample_ddim

    T = args.window
    model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=360,
                         n_layers=6, n_heads=6, goal_seq_len=2,
                         obs_seq_len=T, attention="pallas",
                         dtype=jnp.bfloat16)
    den = GCDenoiser(model, sigma_data=0.5)
    key = jax.random.PRNGKey(0)
    B = args.batch
    s = jnp.zeros((B, T, 30))
    a = jnp.zeros((B, T, 9))
    g = jnp.zeros((B, 2, 30))
    params = den.init(key, s, a, g, jnp.full((B,), 0.5))
    sigmas = get_noise_schedule(args.nfe, 0.005, 1.0, 5.0, "exponential")

    def dn(x, sigma):
        # Picard folds the sigma grid into the batch axis; tile the
        # conditioning to match (sample_picard docstring contract)
        reps = x.shape[0] // B
        s_t = jnp.tile(s, (reps, 1, 1))
        g_t = jnp.tile(g, (reps, 1, 1))
        return den.apply(params, s_t, x, g_t, jnp.broadcast_to(
            sigma, (x.shape[0],)) if jnp.ndim(sigma) == 0 else sigma)

    def timed(fn, label):
        @jax.jit
        def reps(k):
            def body(c, kk):
                out = fn(c, kk)
                return out, ()
            out, _ = jax.lax.scan(body, a, jax.random.split(k, args.reps))
            return jnp.sum(out[0, 0])

        float(reps(key))                     # compile + warmup
        t0 = time.perf_counter()
        float(reps(jax.random.PRNGKey(1)))   # scalar fetch = host sync
        dt = time.perf_counter() - t0
        ms = max((dt * 1e3 - TUNNEL_MS) / args.reps, 0.0)
        print(f"{label}: {ms:.2f} ms/control-step (B={B}, T={T}, "
              f"NFE={args.nfe})")
        return ms

    def seq(x0, k):
        noise = jax.random.normal(k, a.shape) * sigmas[0]
        return sample_ddim(dn, noise, sigmas)

    results = {"batch": B, "tokens": 2 * T + 3, "nfe": args.nfe}
    results["sequential_ddim_ms"] = round(timed(seq, "sequential ddim"), 2)
    for K in (7, 12):
        def pic(x0, k, K=K):
            noise = jax.random.normal(k, a.shape) * sigmas[0]
            return sample_picard(dn, noise, sigmas, k, update="ddim",
                                 n_iterations=K)
        results[f"picard_k{K}_ms"] = round(timed(pic, f"picard K={K}"), 2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
