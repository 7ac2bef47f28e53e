"""Train-step device-trace profiling + throughput scaling (VERDICT r4 #6).

Two modes, both on the reference kitchen training shapes (6L x 360D
DiffusionGPT, AdamW + EMA, fused 50-step device programs — the loop the
reference runs in beso/agents/base_agent.py:70-116 at batch 1024):

* default: capture one fused program under jax.profiler.trace and print
  a per-op-category wall attribution from the TPU plane (the only
  trustworthy fine-grained timing under the axon tunnel — CLAUDE.md).
* --scaling: measure steps/s, samples/s, and cost-model MFU across
  (batch, chunk) configurations. The profile attribution motivates this
  sweep: at batch 1024 the MXU matmuls are <10% of step wall, ~40% is
  LayerNorm fwd/bwd reduction fusions over the small [batch, 11, 360]
  activations (latency-bound), and ~20% is the f32 AdamW+EMA state
  update, which is batch-INDEPENDENT — so occupancy (bigger batch) is
  the TPU-first lever, and steps/s alone understates it.

Usage: python scripts/profile_train.py [--scaling] [--trace-dir DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}


def _setup(batch, chunk, mu_bf16=False):
    import optax

    from beso_tpu.core.densities import make_sample_density
    from beso_tpu.data.slicer import SlicedDataset
    from beso_tpu.data.trajectories import synthetic_kitchen_data
    from beso_tpu.models import DiffusionGPT, GCDenoiser, fit_scaler
    from beso_tpu.train.trainer import Trainer, make_fused_train_steps

    model = DiffusionGPT(state_dim=30, action_dim=9, embed_dim=360,
                         n_layers=6, n_heads=6, goal_seq_len=2,
                         obs_seq_len=4, dtype=jnp.bfloat16)
    den = GCDenoiser(model, sigma_data=0.5)
    data = synthetic_kitchen_data(n_traj=64, t_max=80)
    scaler = fit_scaler(data.all_observations(), data.all_actions())
    train_set = SlicedDataset(data, window=4, future_conditional=True,
                              future_seq_len=2)
    # mu_bf16: first-moment state in bf16 — attacks the ~20% f32
    # optimizer-update term the device trace names (see module docstring)
    optimizer = optax.adamw(1e-4, mu_dtype=jnp.bfloat16 if mu_bf16 else None)
    density = make_sample_density("loglogistic", sigma_data=0.5,
                                  sigma_min=0.005, sigma_max=1.0)
    trainer = Trainer(den, optimizer, density, scaler)
    key = jax.random.PRNGKey(0)
    ts = trainer.init_state(key, train_set.sample_batch(key, 8))
    fused = make_fused_train_steps(den, optimizer, density, scaler,
                                   train_set, batch, chunk)
    return den, optimizer, density, scaler, train_set, ts, fused


def profile(trace_dir):
    batch, chunk = 1024, 50
    _, _, _, _, _, ts, fused = _setup(batch, chunk)
    ts, _ = jax.block_until_ready(fused(ts, jax.random.PRNGKey(1)))

    jax.profiler.start_trace(trace_dir)
    ts, losses = fused(ts, jax.random.PRNGKey(2))
    jax.block_until_ready(losses)
    jax.profiler.stop_trace()

    from jax.profiler import ProfileData
    paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    pd = ProfileData.from_file(sorted(paths)[-1])
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cat = collections.Counter()
            catn = collections.Counter()
            total = 0
            for ev in line.events:
                if ev.name.startswith("%while"):  # outer fused-loop wrapper
                    continue
                m = re.match(r"%([a-zA-Z\-_]+)", ev.name)
                k = m.group(1) if m else ev.name[:24]
                cat[k] += ev.duration_ns
                catn[k] += 1
                total += ev.duration_ns
            print(f"op wall (excl. while wrapper): {total / 1e6:.1f} ms "
                  f"over {chunk} steps -> {total / 1e6 / chunk:.3f} ms/step")
            for k, ns in cat.most_common(20):
                print(f"{ns / 1e6:9.2f} ms {100 * ns / total:5.1f}%  "
                      f"n={catn[k]:6d}  {k}")


def scaling(configs, mu_bf16=False):
    from beso_tpu.train.trainer import make_train_step

    dev = jax.devices()[0]
    peak = PEAK_TFLOPS.get(getattr(dev, "device_kind", ""), 197.0)
    rows = []
    for batch, chunk in configs:
        den, optimizer, density, scaler, train_set, ts, fused = _setup(
            batch, chunk, mu_bf16=mu_bf16)
        t0 = time.time()
        ts, _ = jax.block_until_ready(fused(ts, jax.random.PRNGKey(1)))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            ts, losses = fused(ts, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(losses)
            times.append(time.perf_counter() - t0)
        sps = chunk / min(times)
        mfu = None
        try:
            step_fn = make_train_step(den, optimizer, density, scaler)
            sample = train_set.sample_batch(jax.random.PRNGKey(3), batch)
            ca = jax.jit(step_fn).lower(
                ts, sample, jax.random.PRNGKey(4)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            mfu = float(ca["flops"]) * sps / (peak * 1e12)
        except Exception as e:  # cost model unavailable on some backends
            print("mfu unavailable:", e, file=sys.stderr)
        row = {"batch": batch, "chunk": chunk,
               "steps_per_sec": round(sps, 1),
               "samples_per_sec": int(round(sps * batch)),
               "mfu": round(mfu, 4) if mfu else None,
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"scaling_table": rows}))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--mu-bf16", action="store_true",
                        help="first-moment optimizer state in bf16")
    parser.add_argument("--configs", default=None,
                        help="comma-separated batch:chunk pairs, e.g. "
                             "1024:200,2048:50")
    parser.add_argument("--trace-dir", default="/tmp/beso_train_trace")
    args = parser.parse_args(argv)
    if args.scaling:
        if args.configs:
            cfgs = [tuple(int(x) for x in c.split(":"))
                    for c in args.configs.split(",")]
        else:
            cfgs = [(1024, 50), (1024, 200), (2048, 50), (4096, 50),
                    (8192, 25)]
        scaling(cfgs, mu_bf16=args.mu_bf16)
    else:
        profile(args.trace_dir)


if __name__ == "__main__":
    main()
