"""Accuracy artifact: render evaluation sequences, run them through the
CLI (`run` -> KeyFrameTrajectory.txt, `eval` -> ATE/RPE vs ground truth),
and record EVAL_r{N}.json at the repo root — the reference's evaluation
protocol (TUM-format keyframe trajectory -> ATE RMSE, main.cc:160-185 +
the TRO 2015 paper's metric).

Round-3 hardening (VERDICT r2 #5): sequences no longer assume a perfect
pinhole. Frames are rendered through a NONZERO radial-tangential lens
(k1/k2/p1/p2 in the settings YAML, undistorted by the pipeline exactly as
the reference's Frame::UndistortKeyPoints, src/Frame.cc:289-319), carry
per-frame exposure jitter, sensor noise and vignetting, and are saved as
uint8 PNGs (quantization included). Two sequences (ring-orbit loop +
lateral sweep) x the reference's own 1000-feature / 8-level configuration
(Data/Settings.yaml:26-38).

Usage: python scripts/make_eval.py [--out EVAL_r03.json]"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# moderate real-lens coefficients (webcam/rosbag calibration order of
# magnitude; the reference's example settings carry the same four terms)
DIST = (-0.12, 0.04, 8e-4, -5e-4)

SETTINGS_TMPL = """%YAML:1.0
Camera.fx: {fx}
Camera.fy: {fy}
Camera.cx: {cx}
Camera.cy: {cy}
Camera.k1: {k1}
Camera.k2: {k2}
Camera.p1: {p1}
Camera.p2: {p2}
Camera.fps: 30.0
Camera.RGB: 1
Camera.width: {w}
Camera.height: {h}
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.fastTh: 20
ORBextractor.nScoreType: 1
UseMotionModel: 1
"""


def render_sequence(tmp, scene, poses, photo_seed0, blank=None):
    """`blank[i]` frames render as featureless sensor noise — the
    kidnapped-camera occlusion (tracking must go LOST, the reference's
    Example.bag contains 'two relocalisations from a big viewpoint
    change', README.md:150-172)."""
    from PIL import Image
    img_dir = os.path.join(tmp, "images")
    os.makedirs(img_dir)
    prng = np.random.default_rng(photo_seed0)
    for i in range(len(poses)):
        if blank is not None and blank[i]:
            img = prng.normal(45.0, 2.0, (scene.height, scene.width))
        else:
            img = scene.render_image(
                poses[i], patch=6,
                exposure=float(prng.uniform(0.92, 1.08)),
                bias=float(prng.uniform(-3, 3)),
                vignette=0.2, noise=1.5, quantize=True,
                photo_seed=photo_seed0 + i)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:06d}.png"))
    return img_dir


def write_gt(tmp, poses, blank=None):
    import jax.numpy as jnp
    from orb_slam_tpu.geometry import se3_inverse, rot_to_quat
    gt_path = os.path.join(tmp, "gt.txt")
    with open(gt_path, "w") as f:
        for i in range(len(poses)):
            if blank is not None and blank[i]:
                continue  # pose undefined while the camera is covered
            T_wc = np.asarray(se3_inverse(jnp.asarray(poses[i])))
            q = np.asarray(rot_to_quat(jnp.asarray(T_wc[:3, :3])))
            t = T_wc[:3, 3]
            f.write(f"{i/30.0:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")
    return gt_path


def run_one(name, scene, poses, extra_cli, photo_seed0, blank=None,
            backend="cpu"):
    from orb_slam_tpu.io.trajectory import read_tum

    tmp = tempfile.mkdtemp(prefix=f"slam_eval_{name}_")
    print(f"[{name}] rendering {len(poses)} frames -> {tmp}",
          file=sys.stderr)
    img_dir = render_sequence(tmp, scene, poses, photo_seed0, blank=blank)
    gt_path = write_gt(tmp, poses, blank=blank)

    settings = os.path.join(tmp, "settings.yaml")
    k1, k2, p1, p2 = scene.dist
    with open(settings, "w") as f:
        f.write(SETTINGS_TMPL.format(
            fx=scene.fx, fy=scene.fy, cx=scene.cx, cy=scene.cy,
            k1=k1, k2=k2, p1=p1, p2=p2,
            w=scene.width, h=scene.height))

    traj = os.path.join(tmp, "KeyFrameTrajectory.txt")
    t0 = time.time()
    env = dict(os.environ)
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    else:
        env.pop("JAX_PLATFORMS", None)  # default platform (TPU when present)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "orb_slam_tpu.cli", "run", settings, img_dir,
         "--out", traj] + extra_cli,
        cwd=root, env=env, capture_output=True, text=True)
    print(r.stderr[-2000:], file=sys.stderr)
    if r.returncode != 0:
        raise SystemExit(f"[{name}] cli run failed rc={r.returncode}")
    wall = time.time() - t0
    loops, relocs, platform = -1, -1, "?"
    for line in r.stderr.splitlines():
        if line.startswith("[final]"):
            loops = int(line.split("loops_closed=")[1].split()[0])
            if "relocalisations=" in line:
                relocs = int(line.split("relocalisations=")[1].split()[0])
            if "platform=" in line:
                platform = line.split("platform=")[1].split()[0]

    env_eval = dict(os.environ)
    env_eval["JAX_PLATFORMS"] = "cpu"
    r2 = subprocess.run(
        [sys.executable, "-m", "orb_slam_tpu.cli", "eval", traj, gt_path],
        cwd=root, env=env_eval, capture_output=True, text=True)
    print(r2.stdout, file=sys.stderr)
    ev = json.loads(r2.stdout.strip().splitlines()[-1])

    ts_g, p_g, _ = read_tum(gt_path)
    steps = np.linalg.norm(np.diff(p_g, axis=0), axis=1)
    if blank is not None:
        # exclude the kidnap teleports from the travelled length
        steps = steps[steps < 10.0 * np.median(steps)]
    traj_len = float(np.sum(steps))
    out = {
        "sequence": name,
        "n_frames": len(poses),
        "backend": platform,
        "distortion": list(scene.dist),
        "photometric": "exposure 0.92-1.08, bias +-3, vignette 0.2, "
                       "noise sigma 1.5, uint8 PNG",
        "ate_rmse": ev["ate_rmse"],
        "rpe_1": ev["rpe_1"],
        "loops_closed": loops,
        "relocalisations": relocs,
        "n_keyframes_associated": ev["n_associated"],
        "trajectory_length": round(traj_len, 3),
        "ate_over_length_pct": round(100.0 * ev["ate_rmse"] / traj_len, 2),
        "wall_s": round(wall, 1),
    }
    if blank is not None:
        out["n_blank_frames"] = int(np.sum(blank))
    return out


def ring_pose(phi, radius, center=(0.0, 0.0, 0.0)):
    """World->camera pose on the outward-looking ring orbit (mirrors
    io/synthetic.ring_trajectory at one angle)."""
    c = np.asarray(center, np.float32)
    d = np.array([np.sin(phi), 0.0, np.cos(phi)], np.float32)
    x_cam = np.array([np.cos(phi), 0.0, -np.sin(phi)], np.float32)
    y_cam = np.array([0.0, 1.0, 0.0], np.float32)
    R_cw = np.stack([x_cam, y_cam, d], 1).T
    C = c + radius * d
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R_cw
    T[:3, 3] = -R_cw @ C
    return T


def kidnap_trajectory():
    """Kidnapped-camera sequence (the reference's Example.bag behavioral
    spec: 'a loop closure and two relocalisations from a big viewpoint
    change', README.md:150-172): orbit 0->150deg, 8 covered (blank) frames,
    teleport BACK to 60deg at a nearer orbit radius (mapped region, new
    viewpoint) and keep orbiting through NEW territory to 320deg, 8 more
    blank frames, teleport to 280deg at a third radius and orbit past 360
    into the start arc. Tracking must go LOST at each cut and relocalise
    from the BoW database + EPnP when the scene reappears; the final
    wrap past 360deg re-enters the start arc long after covisibility to
    it is gone, so an ORGANIC loop closure must fire there (round-4's
    trajectory never left mapped territory after relocalising — revisits
    stayed covisibility-connected and no loop was geometrically possible,
    VERDICT r4 #2)."""
    deg = np.pi / 180.0
    poses, blank = [], []

    def seg(a0, a1, n, radius):
        for k in range(n):
            poses.append(ring_pose((a0 + (a1 - a0) * k / n) * deg, radius))
            blank.append(False)

    def gap(n):
        for _ in range(n):
            poses.append(poses[-1].copy())
            blank.append(True)

    seg(0.0, 150.0, 100, 4.0)     # map the start arc
    gap(8)                        # kidnap 1 (occlusion)
    seg(60.0, 320.0, 170, 3.6)    # reloc 1 in mapped arc, then NEW ring
    gap(8)                        # kidnap 2
    seg(280.0, 420.0, 95, 4.2)    # reloc 2, wrap past 360 -> loop closure,
    return np.stack(poses), np.array(blank)  # then re-anchored revisit arc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_r05.json")
    ap.add_argument("--frames", type=int, default=260)
    ap.add_argument("--tpu-ring", action="store_true",
                    help="also run the ring sequence on the default "
                         "(TPU) backend for on-device ATE parity")
    ap.add_argument("--only", default=None,
                    help="run a single sequence by name")
    args = ap.parse_args()

    from orb_slam_tpu.io.synthetic import (
        SyntheticScene, ring_trajectory, lateral_trajectory,
    )

    N = args.frames
    seqs = []

    # 1. ring orbit with an organic loop closure (the validated round-2
    # sequence, now through a distorted lens + photometric nuisance)
    scene1 = SyntheticScene(
        n_points=1200, seed=5, width=320, height=240,
        fx=200.0, fy=200.0, cx=160.0, cy=120.0,
        ring=True, depth_range=(10.0, 13.0), extent=(0, 3.0, 0),
        dist=DIST)
    poses1 = ring_trajectory(N, orbit_radius=4.0,
                             total_angle=2.0 * np.pi * N / 240.0)
    os.environ.setdefault("SLAM_OBS_CAP", "16")
    ring_cli = ["--max-keyframes", "128", "--max-points", "8192",
                "--p-local", "2048", "--min-init-matches", "60"]
    seqs.append(dict(name="ring_loop_dist", scene=scene1, poses=poses1,
                     extra_cli=ring_cli, photo_seed0=4000))

    # 2. lateral sweep (no loop; pure VO accuracy), different seed/world
    scene2 = SyntheticScene(
        n_points=900, seed=29, width=320, height=240,
        fx=200.0, fy=200.0, cx=160.0, cy=120.0,
        extent=(14.0, 5.0, 3.0), depth_range=(6.0, 11.0), dist=DIST)
    poses2 = lateral_trajectory(160, step=0.05, yaw_rate=0.004)
    seqs.append(dict(name="lateral_vo_dist", scene=scene2, poses=poses2,
                     extra_cli=ring_cli, photo_seed0=8000))

    # 3. kidnapped camera: tracking loss + 2 relocalisations on rendered
    # frames through the REAL frontend (VERDICT r3 prescription #4)
    scene3 = SyntheticScene(
        n_points=1200, seed=5, width=320, height=240,
        fx=200.0, fy=200.0, cx=160.0, cy=120.0,
        ring=True, depth_range=(10.0, 13.0), extent=(0, 3.0, 0),
        dist=DIST)
    poses3, blank3 = kidnap_trajectory()
    seqs.append(dict(name="kidnap_reloc_dist", scene=scene3, poses=poses3,
                     extra_cli=ring_cli, photo_seed0=12000, blank=blank3))

    if args.tpu_ring:
        seqs.append(dict(name="ring_loop_dist_tpu", scene=scene1,
                         poses=poses1, extra_cli=ring_cli, photo_seed0=4000,
                         backend="tpu"))
    if args.only:
        seqs = [s for s in seqs if s["name"] == args.only]

    # run the highest-value sequences first: with per-sequence
    # checkpointing, a cut-off suite still records them
    prio = {"kidnap_reloc_dist": 0, "ring_loop_dist": 1,
            "ring_loop_dist_tpu": 2, "lateral_vo_dist": 3}
    seqs.sort(key=lambda s: prio.get(s["name"], 9))

    # checkpoint after every sequence so a crash/restart mid-suite still
    # leaves a valid artifact with the completed sequences
    results = []
    out = {
        "metric": "ate_rmse_keyframe_trajectory",
        "protocol": "TUM keyframe trajectory vs ground truth, Sim3-aligned "
                    "ATE RMSE + RPE(1) on the aligned estimate (reference: "
                    "main.cc:160-185 + TRO'15). Distorted lens rendered / "
                    "undistorted by the pipeline (Frame.cc:289-319), uint8, "
                    "photometric nuisance. 1000 feat / 8 levels "
                    "(Data/Settings.yaml:26-38). kidnap_reloc_dist covers "
                    "the reference's Example.bag behavior: loss of tracking "
                    "under occlusion + relocalisation from a big viewpoint "
                    "change (README.md:150-172).",
        "sequences": results,
    }
    for s in seqs:
        results.append(run_one(**s))
        out["partial"] = len(results) < len(seqs)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out), file=sys.stderr)


if __name__ == "__main__":
    main()
