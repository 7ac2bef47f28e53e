"""Calibrate the JAX block-push contact model against MuJoCo golden rollouts.

The reference's block push runs Bullet rigid-body physics (CPU); the JAX env
(beso_tpu/envs/block_push/env.py) replaces it with a quasi-static planar push
model. This tool builds the SAME scene in host MuJoCo — 0.04 m cube blocks
(mass 0.01, lateral friction 1.0) and a 0.0127 m-radius cylinder effector,
straight from the vendored URDFs (`block2.urdf`, `suction/cylinder_real.urdf`)
— drives the effector through a suite of scripted push scenarios (central,
off-center at several lever arms, edge pushes, block-into-block), and
records 10 Hz block (x, y, yaw) trajectories.

Outputs tests/golden/block_push_mujoco.npz consumed by
tests/test_block_push_fidelity.py, and prints the JAX model's trajectory
error per scenario.

Round-4 methodology (VERDICT r3 #1): the scenario set splits into STABLE
scenarios (off-center, rotated, diagonal — MuJoCo final-state dispersion
under +-0.5 mm initial perturbation is a few mm / a few deg) and CHAOTIC
ones (central, block_into_block — dispersion 30-50 mm: long aligned plows
break by numerical symmetry-breaking at an unpredictable point). Pointwise
RMSE is only meaningful on the stable set; the chaotic ones are judged
against the MuJoCo perturbation BAND (--dispersion prints it). --burst
prints a per-substep instrumented trace of a contact burst (block
velocity, spin, floor-normal z, contact count/force) — the measurement
behind the tipping-plateau force law in env.py.

Run: python scripts/calibrate_block_push.py [--out tests/golden/...]
     [--ensemble N] [--sweep] [--burst] [--dispersion]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# host-side calibration tool: force CPU before first backend use (the axon
# TPU plugin overrides the JAX_PLATFORMS env var, see tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

CONTROL_DT = 0.1          # 10 Hz control (block_pushing.py:188)
SUBSTEP_HZ = 240          # Bullet step frequency (block_pushing.py:269-281)
EFFECTOR_SPEED = 1.0      # m/s tracking cap (matches the JAX env)
BLOCK_HALF = 0.02         # block2.urdf: 0.04 box
EFF_RADIUS = 0.0127       # cylinder_real.urdf
N_CONTROL_STEPS = 12

_SCENE = f"""
<mujoco>
  <option timestep="{1.0 / SUBSTEP_HZ}" integrator="implicitfast"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"
          friction="1.0 0.001 0.0001"/>
    <body name="b0" pos="0.4 -0.2 {BLOCK_HALF}">
      <freejoint/>
      <geom type="box" size="{BLOCK_HALF} {BLOCK_HALF} {BLOCK_HALF}"
            mass="0.01" friction="1.0 0.001 0.0001"/>
    </body>
    <body name="b1" pos="0.8 0.6 {BLOCK_HALF}">
      <freejoint/>
      <geom type="box" size="{BLOCK_HALF} {BLOCK_HALF} {BLOCK_HALF}"
            mass="0.01" friction="1.0 0.001 0.0001"/>
    </body>
    <body name="eff" mocap="true" pos="0.3 -0.4 {BLOCK_HALF}">
      <geom type="cylinder" size="{EFF_RADIUS} 0.0675"
            contype="1" conaffinity="1" mass="1.0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _scenarios():
    """Each: (name, b0_pos, b0_yaw, b1_pos, effector_start, target_offsets).

    target_offsets: per-control-step delta-xy of the effector target
    (the policy's action space)."""
    fwd = [(0.0, 0.035)] * N_CONTROL_STEPS
    out = []
    # central push from below: effector starts aligned with the block center
    out.append(("central", (0.4, -0.2), 0.0, (0.8, 0.6), (0.4, -0.33), fwd))
    # off-center pushes: lever arms of 1/4, 1/2, 3/4 block half-width
    for frac in (0.25, 0.5, 0.75):
        dx = frac * BLOCK_HALF
        out.append((f"offcenter_{frac}", (0.4, -0.2), 0.0, (0.8, 0.6),
                    (0.4 + dx, -0.33), fwd))
    # rotated block, central approach
    out.append(("rotated", (0.4, -0.2), 0.6, (0.8, 0.6), (0.4, -0.33), fwd))
    # diagonal push
    diag = [(0.025, 0.025)] * N_CONTROL_STEPS
    out.append(("diagonal", (0.42, -0.2), 0.0, (0.8, 0.6), (0.36, -0.3), diag))
    # block-into-block: second block directly in the push path
    out.append(("block_into_block", (0.4, -0.2), 0.0, (0.4, -0.11),
                (0.4, -0.3), fwd))
    return out


def run_mujoco(scn):
    import mujoco

    name, b0, yaw0, b1, eff0, offsets = scn
    model = mujoco.MjModel.from_xml_string(_SCENE)
    data = mujoco.MjData(model)
    # set block poses (freejoint qpos: 3 pos + 4 quat)
    data.qpos[0:3] = [b0[0], b0[1], BLOCK_HALF]
    data.qpos[3:7] = [np.cos(yaw0 / 2), 0, 0, np.sin(yaw0 / 2)]
    data.qpos[7:10] = [b1[0], b1[1], BLOCK_HALF]
    data.qpos[10:14] = [1, 0, 0, 0]
    data.mocap_pos[0] = [eff0[0], eff0[1], 0.0675]
    mujoco.mj_forward(model, data)

    sub_per_ctrl = int(SUBSTEP_HZ * CONTROL_DT)
    max_step = EFFECTOR_SPEED / SUBSTEP_HZ
    eff = np.asarray(eff0, float)
    tgt = eff.copy()
    traj = []
    for delta in offsets:
        tgt = tgt + np.asarray(delta)
        for _ in range(sub_per_ctrl):
            to_tgt = tgt - eff
            d = np.linalg.norm(to_tgt)
            if d > 1e-9:
                eff = eff + to_tgt / d * min(d, max_step)
            data.mocap_pos[0] = [eff[0], eff[1], 0.0675]
            mujoco.mj_step(model, data)
        qw, qx, qy, qz = data.qpos[3:7]
        yaw = np.arctan2(2 * (qw * qz + qx * qy),
                         1 - 2 * (qy * qy + qz * qz))
        traj.append([data.qpos[0], data.qpos[1], yaw,
                     data.qpos[7], data.qpos[8]])
    return np.asarray(traj)  # [T, 5]: b0 x y yaw, b1 x y


def run_jax(scn, k2=None):
    import functools

    import jax
    import jax.numpy as jnp

    import beso_tpu.envs.block_push.env as bpe

    name, b0, yaw0, b1, eff0, offsets = scn
    state = bpe.BlockPushState(
        effector=jnp.asarray(eff0), effector_target=jnp.asarray(eff0),
        block_pos=jnp.asarray([b0, b1]), block_yaw=jnp.asarray([yaw0, 0.0]),
        target_pos=jnp.asarray([[0.28, 0.2], [0.52, 0.2]]),
        target_yaw=jnp.asarray([np.pi, np.pi]),
        in_target=jnp.zeros((2, 2), bool), completed=jnp.zeros((4,), bool),
        done=jnp.asarray(False), steps=jnp.zeros((), jnp.int32))

    @functools.partial(jax.jit, static_argnums=(2,))
    def rollout(state, offs, k2_):
        def body(s, a):
            s, obs, _, _ = bpe.block_push_step(s, a, friction_k2=k2_)
            return s, obs[:5]
        _, traj = jax.lax.scan(body, state, offs)
        return traj

    return np.asarray(rollout(state, jnp.asarray(offsets, jnp.float32), k2))


def _mk_state(b0, yaw0, b1, eff0):
    import jax.numpy as jnp

    import beso_tpu.envs.block_push.env as bpe

    return bpe.BlockPushState(
        effector=jnp.asarray(eff0), effector_target=jnp.asarray(eff0),
        block_pos=jnp.asarray([b0, b1]), block_yaw=jnp.asarray([yaw0, 0.0]),
        target_pos=jnp.asarray([[0.28, 0.2], [0.52, 0.2]]),
        target_yaw=jnp.asarray([np.pi, np.pi]),
        in_target=jnp.zeros((2, 2), bool), completed=jnp.zeros((4,), bool),
        done=jnp.asarray(False), steps=jnp.zeros((), jnp.int32))


def run_jax_batch(scns):
    """All scenarios in ONE vmapped jit (the sweep re-traces per constant
    set; per-scenario re-jits would cost ~3 s compile each)."""
    import jax
    import jax.numpy as jnp

    import beso_tpu.envs.block_push.env as bpe

    states = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[_mk_state(s[1], s[2], s[3], s[4]) for s in scns])
    offs = jnp.asarray([s[5] for s in scns], jnp.float32)

    def one(state, offsets):
        def body(s, a):
            s, obs, _, _ = bpe.block_push_step(s, a)
            return s, obs[:5]
        _, traj = jax.lax.scan(body, state, offsets)
        return traj

    return np.asarray(jax.jit(jax.vmap(one))(states, offs))


def run_rot_sweep(args):
    """Sweep the ROTATIONAL legs of the contact model (VERDICT r4 #4a):
    pusher tangential friction CONTACT_MU, ground corner-point arm scale,
    and the tip-torque leak (fraction of the above-plateau contact force
    coupled into yaw torque). Scores each combo on the stable-5 scripted
    RMSE (target: yaw <= 10 deg with pos <= 6 mm held) AND the 48-push
    randomized-ensemble statistics vs the stored MuJoCo bands."""
    import jax.numpy as jnp

    import beso_tpu.envs.block_push.env as bpe

    golden = np.load(args.out)
    ens_mj = np.load(Path(args.out).with_name("block_push_mujoco_ensemble.npz"))
    stable = [s for s in _scenarios() if s[0] in STABLE_SCENARIOS]
    ens = ensemble_scenarios(48)
    base_pts = np.asarray(bpe._GROUND_PTS)

    def score(label):
        jx = run_jax_batch(stable)
        tp = ty = 0.0
        for s, t in zip(stable, jx):
            p, y = error(golden[s[0]], t)
            tp += p
            ty += y
        tp, ty = tp / len(stable) * 1000, np.degrees(ty / len(stable))
        ej = run_jax_batch(ens)
        d_par, d_perp, d_yaw = ensemble_stats(list(ej))
        ok = "<=OK=>" if (ty <= 10.0 and tp <= 6.0) else "      "
        print(f"{ok} {label}: stable pos {tp:5.1f} mm yaw {ty:5.1f} deg | "
              f"ens par {d_par.mean()*1000:5.1f} perp "
              f"{np.abs(d_perp).mean()*1000:5.1f} "
              f"|dyaw| {np.degrees(d_yaw.mean()):5.1f} "
              f"(mj {ens_mj['d_par'].mean()*1000:.1f}/"
              f"{np.abs(ens_mj['d_perp']).mean()*1000:.1f}/"
              f"{np.degrees(ens_mj['d_yaw'].mean()):.1f})")

    import itertools
    mus = [0.02, 0.05, 0.1, 0.2]
    arms = [1.0, 1.25, 1.5]
    tleaks = [0.0, 0.1]
    for mu, arm, tleak in itertools.product(mus, arms, tleaks):
        bpe.CONTACT_MU = mu
        bpe.TIP_TORQUE_LEAK = tleak
        bpe._GROUND_PTS = jnp.asarray(base_pts * arm)
        score(f"mu={mu:<4} arm={arm:<4} tq_leak={tleak}")


def wrap_angle(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def error(mj, jx):
    pos = np.sqrt(np.mean((mj[:, [0, 1, 3, 4]] - jx[:, [0, 1, 3, 4]]) ** 2))
    yaw = np.sqrt(np.mean(wrap_angle(mj[:, 2] - jx[:, 2]) ** 2))
    return pos, yaw


def ensemble_scenarios(n=48, seed=0):
    """Randomized northward pushes: random block yaw, random lateral
    approach offset. Individual contact-rich trajectories are chaotic (a
    perfectly central MuJoCo push drifts ~3 cm sideways from numerical
    symmetry breaking), so fidelity is judged on ensemble STATISTICS."""
    rng = np.random.default_rng(seed)
    out = []
    fwd = [(0.0, 0.035)] * N_CONTROL_STEPS
    for i in range(n):
        yaw = float(rng.uniform(0, np.pi))
        dx = float(rng.uniform(-0.8, 0.8) * BLOCK_HALF)
        out.append((f"ens_{i}", (0.4, -0.2), yaw, (0.8, 0.6),
                    (0.4 + dx, -0.33), fwd))
    return out


def ensemble_stats(trajs):
    """Per-scenario net effect -> ensemble stats. Push is northward, so
    'parallel' = y displacement, 'perp' = x displacement."""
    d_par = np.asarray([t[-1, 1] - (-0.2) for t in trajs])
    d_perp = np.asarray([t[-1, 0] - 0.4 for t in trajs])
    d_yaw = np.asarray([np.abs(wrap_angle(t[-1, 2] - t0)) for t, t0 in trajs2_yaw(trajs)])
    return d_par, d_perp, d_yaw


def trajs2_yaw(trajs):
    return [(t, t[0, 2]) for t in trajs]


def run_ensemble(scns, runner, **kw):
    return [runner(s, **kw) if kw else runner(s) for s in scns]


def report_ensemble(name, d_par, d_perp, d_yaw):
    print(f"{name}: push-parallel {d_par.mean()*1000:6.1f} +- "
          f"{d_par.std()*1000:5.1f} mm | perp |{np.abs(d_perp).mean()*1000:5.1f}| mm "
          f"| |dyaw| {np.degrees(d_yaw.mean()):5.1f} +- "
          f"{np.degrees(d_yaw.std()):4.1f} deg")


STABLE_SCENARIOS = ("offcenter_0.25", "offcenter_0.5", "offcenter_0.75",
                    "rotated", "diagonal")


def run_burst(dx=0.01):
    """Per-substep instrumentation of one contact burst (the measurement
    behind env.py's tipping-plateau law): block velocity/spin/floor z and
    pusher contact count + total normal force."""
    import mujoco

    model = mujoco.MjModel.from_xml_string(_SCENE)
    data = mujoco.MjData(model)
    data.qpos[0:3] = [0.4, -0.2, BLOCK_HALF]
    data.qpos[3:7] = [1, 0, 0, 0]
    data.qpos[7:10] = [0.8, 0.6, BLOCK_HALF]
    data.qpos[10:14] = [1, 0, 0, 0]
    data.mocap_pos[0] = [0.4 + dx, -0.24, 0.0675]
    mujoco.mj_forward(model, data)
    eff = np.array([0.4 + dx, -0.24])
    tgt = eff + np.array([0.0, 0.07])
    max_step = EFFECTOR_SPEED / SUBSTEP_HZ
    print("sub | blk_y    blk_x   | vy     vx     wz    | z      | nc  Fn")
    for s in range(48):
        to = tgt - eff
        d = np.linalg.norm(to)
        if d > 1e-9:
            eff = eff + to / d * min(d, max_step)
        data.mocap_pos[0] = [eff[0], eff[1], 0.0675]
        mujoco.mj_step(model, data)
        fn, nc = 0.0, 0
        for ci in range(data.ncon):
            names = {mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, g)
                     for g in (data.contact[ci].geom1, data.contact[ci].geom2)}
            if "floor" not in names:
                f6 = np.zeros(6)
                mujoco.mj_contactForce(model, data, ci, f6)
                nc += 1
                fn += f6[0]
        if s % 2 == 0:
            print(f"{s:3d} | {data.qpos[1]:7.4f} {data.qpos[0]:7.4f} | "
                  f"{data.qvel[1]:6.3f} {data.qvel[0]:6.3f} "
                  f"{data.qvel[5]:6.2f} | {data.qpos[2]:.4f} | {nc}  {fn:.2f}")


def _perturbed(scn, perts):
    name, b0, yaw0, b1, eff0, offsets = scn
    return [(name, (b0[0] + p[0], b0[1] + p[1]), yaw0, b1, eff0, offsets)
            for p in perts]


def _fmt_band(f):
    return (f"x {f[:, 0].mean():.3f}+-{f[:, 0].std()*1000:5.1f}mm "
            f"y {f[:, 1].mean():.3f}+-{f[:, 1].std()*1000:5.1f}mm "
            f"yaw {np.degrees(f[:, 2].mean()):6.1f}"
            f"+-{np.degrees(f[:, 2].std()):5.1f}deg")


def run_dispersion(n=8, seed=1, jax_side=False, mujoco_side=True):
    """Final-state dispersion of each scripted scenario under +-0.5 mm
    initial block perturbation — separates the STABLE scenarios
    (pointwise-matchable) from the CHAOTIC ones (band-matchable only).
    With `jax_side`, prints the JAX model's band next to MuJoCo's: the
    chaotic scenarios are judged on mean AND dispersion (VERDICT r4 #4b)."""
    rng = np.random.default_rng(seed)
    perts = rng.uniform(-5e-4, 5e-4, (n, 2))
    for scn in _scenarios():
        name = scn[0]
        tag = "stable " if name in STABLE_SCENARIOS else "CHAOTIC"
        if mujoco_side:
            f = np.asarray([run_mujoco(s)[-1, :3] for s in _perturbed(scn, perts)])
            print(f"{tag} {name:18s} mj  {_fmt_band(f)}")
        if jax_side:
            fj = run_jax_batch(_perturbed(scn, perts))[:, -1, :3]
            print(f"{tag} {name:18s} jax {_fmt_band(fj)}")


def run_dither_sweep(n=16, seed=1):
    """Sweep CONTACT_DITHER against the chaotic scenarios' MuJoCo
    self-dispersion bands (mean AND std must land inside; VERDICT r4 #4b),
    with the stable-5 RMSE re-checked at each magnitude."""
    import beso_tpu.envs.block_push.env as bpe

    rng = np.random.default_rng(seed)
    perts = rng.uniform(-5e-4, 5e-4, (n, 2))
    chaotic = [s for s in _scenarios() if s[0] not in STABLE_SCENARIOS]
    stable = [s for s in _scenarios() if s[0] in STABLE_SCENARIOS]
    golden = np.load(Path(__file__).resolve().parents[1] / "tests" /
                     "golden" / "block_push_mujoco.npz")
    print("MuJoCo bands (n=%d):" % n)
    mj_bands = {}
    for scn in chaotic:
        f = np.asarray([run_mujoco(s)[-1, :3] for s in _perturbed(scn, perts)])
        mj_bands[scn[0]] = f
        print(f"  {scn[0]:18s} {_fmt_band(f)}")
    import itertools
    for stiff, ang, bba in itertools.product((4.0, 6.0, 8.0),
                                             (0.05, 0.1), (0.0, 0.1)):
        bpe.CONTACT_DITHER = 0.0
        bpe.BACKED_STIFF = stiff
        bpe.DITHER_ANG = ang
        bpe.BB_DITHER_ANG = bba
        rows = []
        for scn in chaotic:
            fj = run_jax_batch(_perturbed(scn, perts))[:, -1, :3]
            rows.append(f"  {scn[0]:18s} {_fmt_band(fj)}")
        jx = run_jax_batch(stable)
        tp = ty = 0.0
        for s, t in zip(stable, jx):
            p, y = error(golden[s[0]], t)
            tp += p
            ty += y
        print(f"stiff={stiff:g} ang={ang:g} bba={bba:g} (stable-5 pos "
              f"{tp/len(stable)*1000:.1f} mm "
              f"yaw {np.degrees(ty/len(stable)):.1f} deg)")
        for r in rows:
            print(r)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / "tests" / "golden" /
        "block_push_mujoco.npz"))
    parser.add_argument("--sweep", action="store_true",
                        help="sweep YAW_GAIN and report errors")
    parser.add_argument("--ensemble", type=int, default=0,
                        help="also run an N-scenario randomized ensemble and "
                             "report distribution statistics")
    parser.add_argument("--burst", action="store_true",
                        help="per-substep instrumented burst trace")
    parser.add_argument("--dispersion", action="store_true",
                        help="MuJoCo self-dispersion of each scenario")
    parser.add_argument("--rot-sweep", action="store_true",
                        help="sweep the contact model's rotational legs "
                             "(CONTACT_MU, ground arm, tip-torque leak) "
                             "against the stored golden data")
    parser.add_argument("--dither-sweep", action="store_true",
                        help="sweep CONTACT_DITHER against the chaotic "
                             "scenarios' MuJoCo dispersion bands")
    parser.add_argument("--jax-dispersion", action="store_true",
                        help="print the JAX dispersion bands next to "
                             "MuJoCo's")
    args = parser.parse_args(argv)

    if args.burst:
        run_burst()
        return
    if args.dispersion or args.jax_dispersion:
        run_dispersion(jax_side=args.jax_dispersion)
        return
    if args.rot_sweep:
        run_rot_sweep(args)
        return
    if args.dither_sweep:
        run_dither_sweep()
        return

    if args.ensemble:
        scns = ensemble_scenarios(args.ensemble)
        mj = run_ensemble(scns, run_mujoco)
        mj_stats = ensemble_stats(mj)
        report_ensemble("mujoco", *mj_stats)
        np.savez(Path(args.out).with_name("block_push_mujoco_ensemble.npz"),
                 d_par=mj_stats[0], d_perp=mj_stats[1], d_yaw=mj_stats[2])
        import beso_tpu.envs.block_push.env as bpe
        k2s = ([bpe.FRICTION_K2 * m for m in (0.25, 0.5, 1.0, 2.0, 4.0)]
               if args.sweep else [None])
        for k2 in k2s:
            jx = [run_jax(s, k2=k2) for s in scns]
            label = (f"jax k2={k2:.2e}" if k2 is not None else "jax shipped")
            report_ensemble(label, *ensemble_stats(jx))
        return

    scns = _scenarios()
    golden = {}
    for scn in scns:
        golden[scn[0]] = run_mujoco(scn)
        print(f"mujoco {scn[0]}: final b0 = "
              f"{golden[scn[0]][-1, :3].round(4)}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    meta = {f"{s[0]}__meta": np.asarray(
        [*s[1], s[2], *s[3], *s[4]], float) for s in scns}
    offs = {f"{s[0]}__offsets": np.asarray(s[5], float) for s in scns}
    np.savez(out, **golden, **meta, **offs)
    print(f"wrote {out}")

    import beso_tpu.envs.block_push.env as bpe
    k2s = ([bpe.FRICTION_K2 * m for m in (0.5, 1.0, 2.0)]
           if args.sweep else [None])
    for k2 in k2s:
        tot_p = tot_y = 0.0
        for scn in scns:
            jx = run_jax(scn, k2=k2)
            p, y = error(golden[scn[0]], jx)
            tot_p += p
            tot_y += y
            if not args.sweep:
                print(f"  jax {scn[0]}: pos RMSE {p*1000:.1f} mm, "
                      f"yaw RMSE {np.degrees(y):.1f} deg")
        label = f"k2={k2:.2e}" if k2 is not None else "shipped constants"
        print(f"{label}: mean pos RMSE {tot_p/len(scns)*1000:.1f} mm, "
              f"mean yaw RMSE {np.degrees(tot_y/len(scns)):.1f} deg")


if __name__ == "__main__":
    main()
