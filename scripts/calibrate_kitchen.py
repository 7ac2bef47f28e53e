"""Calibrate the kitchen surrogate's articulation response against MuJoCo.

The adept_envs Franka-kitchen MuJoCo XML is not vendored in the reference
mount, so exact-geometry parity is out of reach; what CAN be anchored with
a real rigid-body simulator is the surrogate's articulation LAW — how a
hinged door / sliding door / rotary knob responds to a fingertip dragging
its handle. This tool builds single-element MuJoCo scenes (hinged door with
a handle bar, sliding door, knob with a lever) at adept_envs-plausible
dimensions, drags a mocap fingertip through the handle along the same
straight-line strokes the surrogate's oracle uses, records the joint
trajectory, and compares it to the surrogate's linear drive law
(q += drive_gain * (fingertip displacement . drive_dir) within
interact_radius, beso_tpu/envs/kitchen/env.py:313-330).

The physical prediction for a handle at radius r from the hinge is
gain ~ 1/r for small angles (arc length = r * dtheta); the measured slope
additionally folds in slip and contact migration, which is exactly what
needs calibrating.

Writes tests/golden/kitchen_mujoco.npz; tests/test_kitchen_fidelity.py pins
the response bands.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

SUBSTEP_HZ = 240
CONTROL_DT = 0.08          # kitchen control step (12.5 Hz)
FINGER_R = 0.02

# hinged door: vertical z-hinge at the origin, door slab 0.35 wide, handle
# bar at r = 0.30 from the hinge (microwave-door-like)
_HINGE_SCENE = """
<mujoco>
  <option timestep="{dt}" integrator="implicitfast"/>
  <worldbody>
    <body name="door">
      <joint name="hinge" type="hinge" axis="0 0 1" damping="0.5"
             frictionloss="0.2" range="-2.5 0"/>
      <geom type="box" pos="0.175 0 0" size="0.175 0.012 0.25" mass="1.2"/>
      <geom name="handle" type="cylinder" fromto="0.30 -0.07 -0.1 0.30 -0.07 0.1"
            size="0.012" mass="0.05"/>
    </body>
    <body name="finger" mocap="true" pos="0.30 -0.12 0">
      <geom type="sphere" size="{fr}" contype="1" conaffinity="1" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
""".format(dt=1.0 / SUBSTEP_HZ, fr=FINGER_R)

# sliding door: prismatic joint along x, handle knob at the leading edge
_SLIDE_SCENE = """
<mujoco>
  <option timestep="{dt}" integrator="implicitfast"/>
  <worldbody>
    <body name="door">
      <joint name="slide" type="slide" axis="1 0 0" damping="2.0"
             frictionloss="0.5" range="0 0.6"/>
      <geom type="box" pos="0 0 0" size="0.20 0.012 0.18" mass="1.0"/>
      <geom name="handle" type="sphere" pos="0.18 -0.045 0" size="0.018"
            mass="0.03"/>
    </body>
    <body name="finger" mocap="true" pos="0.18 -0.10 0">
      <geom type="sphere" size="{fr}" contype="1" conaffinity="1" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
""".format(dt=1.0 / SUBSTEP_HZ, fr=FINGER_R)

# knob: small hinge with a lever arm of 0.05 (burner-knob-like)
_KNOB_SCENE = """
<mujoco>
  <option timestep="{dt}" integrator="implicitfast"/>
  <worldbody>
    <body name="knob">
      <joint name="turn" type="hinge" axis="0 1 0" damping="0.02"
             frictionloss="0.02" range="-4 0"/>
      <geom type="cylinder" fromto="0 -0.02 0 0 0.02 0" size="0.02"
            mass="0.05"/>
      <geom name="lever" type="capsule" fromto="0 -0.03 0 0.05 -0.03 0"
            size="0.008" mass="0.01"/>
    </body>
    <body name="finger" mocap="true" pos="0.05 -0.08 0">
      <geom type="sphere" size="0.012" contype="1" conaffinity="1" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
""".format(dt=1.0 / SUBSTEP_HZ)


def drag(scene_xml, start, stroke, n_ctrl=10, speed=1.0):
    """Drag the mocap fingertip from `start` along `stroke` (total vector)
    over n_ctrl control steps; return joint angle per control step."""
    import mujoco

    model = mujoco.MjModel.from_xml_string(scene_xml)
    data = mujoco.MjData(model)
    data.mocap_pos[0] = start
    mujoco.mj_forward(model, data)
    sub = int(SUBSTEP_HZ * CONTROL_DT)
    per_ctrl = np.asarray(stroke) / n_ctrl
    pos = np.asarray(start, float)
    out = []
    for _ in range(n_ctrl):
        tgt = pos + per_ctrl
        for _ in range(sub):
            d = tgt - pos
            dist = np.linalg.norm(d)
            step = min(dist, speed / SUBSTEP_HZ)
            if dist > 1e-9:
                pos = pos + d / dist * step
            data.mocap_pos[0] = pos
            mujoco.mj_step(model, data)
        out.append(float(data.qpos[0]))
    return np.asarray(out)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / "tests" / "golden" /
        "kitchen_mujoco.npz"))
    parser.add_argument("--kettle", action="store_true",
                        help="also run the kettle grasp-and-drag experiment")
    args = parser.parse_args(argv)

    results = {}
    if args.kettle:
        kt = kettle_drag([0.0, 0.25])
        results["kettle_drag"] = kt
        track = kt[-1, 1] / kt[-1, 3] if kt[-1, 3] else 0.0
        print(f"kettle grasped-drag tracking: {track:.2f} "
              f"(surrogate kettle_gain: 1.0) traj y: {np.round(kt[:, 1], 3)}")

    # hinged door: fingertip hooks BETWEEN the door slab and the handle bar
    # (slab surface y=-0.012, bar surface y=-0.058, finger r=0.02 fits the
    # 0.046 gap) and pulls outward (-y); the curved variant adds the
    # tangential -x component a real opening stroke has.
    hinge_straight = drag(_HINGE_SCENE, [0.30, -0.036, 0.0], [0.0, -0.30, 0.0])
    hinge_diag = drag(_HINGE_SCENE, [0.30, -0.036, 0.0], [-0.20, -0.22, 0.0])
    results["hinge_straight"] = hinge_straight
    results["hinge_diag"] = hinge_diag

    # slide door: push the handle knob from behind along the slide axis
    slide = drag(_SLIDE_SCENE, [0.138, -0.045, 0.0], [0.40, 0.0, 0.0])
    results["slide"] = slide

    # knob: fingertip presses the lever tip downward (-z) from above;
    # torque about the +y hinge axis is positive
    knob = drag(_KNOB_SCENE, [0.045, -0.03, 0.025], [0.0, 0.0, -0.12])
    results["knob"] = knob

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **results)

    print("MuJoCo articulation responses (joint value per control step):")
    for k, v in results.items():
        print(f"  {k}: final {v[-1]:+.3f}  trajectory {np.round(v, 3)}")

    # effective linear gains (joint per meter of fingertip stroke) for
    # comparison with the surrogate's drive_gain table
    print("\neffective |gain| = |dq| / |stroke|:")
    print(f"  hinge straight : {abs(hinge_straight[-1]) / 0.30:.2f} rad/m "
          f"(surrogate microwave/hinge-cabinet gains: 5.0 / 8.0)")
    print(f"  hinge diagonal : {abs(hinge_diag[-1]) / 0.297:.2f} rad/m")
    print(f"  slide          : {abs(slide[-1]) / 0.40:.2f} m/m "
          f"(surrogate slide gain: 2.0)")
    print(f"  knob           : {abs(knob[-1]) / 0.12:.2f} rad/m "
          f"(surrogate knob gain: 6.0)")




# ---------------------------------------------------------------------------
# kettle grasp-and-drag golden experiment (run with --kettle)
# ---------------------------------------------------------------------------

_KETTLE_SCENE = """
<mujoco>
  <option timestep="{dt}" integrator="implicitfast"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1" friction="0.6 0.001 0.0001"/>
    <body name="kettle" pos="0 0 0.06">
      <freejoint/>
      <geom type="cylinder" size="0.08 0.06" mass="0.6"
            friction="0.6 0.001 0.0001"/>
      <geom name="khandle" type="capsule" fromto="-0.02 0 0.14 0.02 0 0.14"
            size="0.012" mass="0.05"/>
      <geom type="box" pos="0 0 0.125" size="0.004 0.004 0.02" mass="0.01"/>
    </body>
    <body name="f1" mocap="true" pos="0 -0.05 0.20">
      <geom type="box" size="0.008 0.012 0.02" contype="1" conaffinity="1"
            friction="1.5 0.005 0.0001" mass="0.2"/>
    </body>
    <body name="f2" mocap="true" pos="0 0.05 0.20">
      <geom type="box" size="0.008 0.012 0.02" contype="1" conaffinity="1"
            friction="1.5 0.005 0.0001" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
""".format(dt=1.0 / SUBSTEP_HZ)


def kettle_drag(drag_vec, n_ctrl=8):
    """Two mocap 'fingers' close on the kettle handle, then drag along the
    squeeze axis (the trailing finger carries the handle through NORMAL
    contact force; mocap bodies teleport with zero velocity, so tangential
    friction cannot drag — a measured MuJoCo-mocap artifact). Returns the
    kettle xy + fingertip path per control step; the tracking ratio
    calibrates the surrogate's kettle_gain."""
    import mujoco

    model = mujoco.MjModel.from_xml_string(_KETTLE_SCENE)
    data = mujoco.MjData(model)
    mujoco.mj_forward(model, data)
    sub = int(SUBSTEP_HZ * CONTROL_DT)

    # phase 1: close the fingers on the handle (y: -0.05/0.05 -> -0.017/0.017)
    for i in range(sub):
        frac = min(1.0, i / (sub * 0.6))
        gap = 0.05 - frac * 0.027
        data.mocap_pos[0] = [0, -gap, 0.20]
        data.mocap_pos[1] = [0, gap, 0.20]
        mujoco.mj_step(model, data)

    # phase 2: drag
    per = np.asarray(drag_vec) / n_ctrl
    hand = np.zeros(2)
    traj = []
    for _ in range(n_ctrl):
        tgt = hand + per
        for _ in range(sub):
            d = tgt - hand
            dist = np.linalg.norm(d)
            step = min(dist, 1.0 / SUBSTEP_HZ)
            if dist > 1e-9:
                hand = hand + d / dist * step
            data.mocap_pos[0] = [hand[0], -0.023 + hand[1], 0.20]
            data.mocap_pos[1] = [hand[0], 0.023 + hand[1], 0.20]
            mujoco.mj_step(model, data)
        traj.append([data.qpos[0], data.qpos[1], hand[0], hand[1]])
    return np.asarray(traj)


if __name__ == "__main__":
    main()
