"""Demo: render a synthetic sequence to disk, run the full SLAM system on
the images through the CLI-equivalent path, write the trajectory, evaluate
ATE, and plot the map.

    python examples/run_synthetic.py [out_dir]
"""

import json
import os
import sys

import numpy as np


def main(out_dir="/tmp/orb_slam_tpu_demo"):
    os.makedirs(out_dir, exist_ok=True)
    img_dir = os.path.join(out_dir, "frames")
    os.makedirs(img_dir, exist_ok=True)

    from PIL import Image

    from orb_slam_tpu.io.synthetic import SyntheticScene, lateral_trajectory
    from orb_slam_tpu.io.trajectory import (
        write_tum, ate_rmse, camera_centers_from_cw,
    )
    from orb_slam_tpu.io.dataset import ImageDirDataset
    from orb_slam_tpu.io.viz import draw_map
    from orb_slam_tpu.frontend.orb_extractor import ORBConfig
    from orb_slam_tpu.pipeline.system import SLAMSystem, SlamConfig, STATE_NAMES
    from orb_slam_tpu.slam_map import MapConfig
    from orb_slam_tpu.geometry import CameraModel

    # 1. render a sequence
    scene = SyntheticScene(n_points=220, seed=21, width=320, height=240,
                           fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                           extent=(7.0, 5.0, 3.0), depth_range=(5.5, 8.5))
    n_frames = 20
    poses = lateral_trajectory(n_frames, step=0.1)
    for i in range(n_frames):
        img = scene.render_image(poses[i], patch=5)
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:06d}.png"))
    print(f"rendered {n_frames} frames to {img_dir}")

    # 2. run SLAM over the image directory
    cfg = SlamConfig(
        camera=CameraModel.create(scene.fx, scene.fy, scene.cx, scene.cy,
                                  width=320, height=240),
        orb=ORBConfig(n_features=400, n_levels=4),
        map=MapConfig(max_keyframes=16, max_points=1024, n_features=400),
        p_local=512, n_triangulation_neighbors=2, n_fuse_neighbors=2,
        local_ba_window=4, min_init_matches=60, min_init_keypoints=60,
        enable_loop_closing=False, enable_relocalisation=False,
    )
    system = SLAMSystem(cfg)
    est = {}
    for ts, img in ImageDirDataset(img_dir):
        fid = system.frame_id
        T = system.process(img=img, timestamp=ts)
        if T is not None:
            est[fid] = T
        print(f"frame {fid}: {STATE_NAMES[system.state]} "
              f"kfs={system.n_keyframes} pts={system.n_points}")

    # 3. outputs
    traj_path = os.path.join(out_dir, "KeyFrameTrajectory.txt")
    write_tum(traj_path, system.keyframe_trajectory())
    map_path = os.path.join(out_dir, "map.png")
    draw_map(system, map_path)

    ids = sorted(est.keys())
    C_est = camera_centers_from_cw(np.stack([est[i] for i in ids]))
    C_gt = camera_centers_from_cw(poses[ids])
    rmse, _ = ate_rmse(C_est, C_gt)
    print(json.dumps({
        "frames_tracked": len(est),
        "keyframes": system.n_keyframes,
        "map_points": system.n_points,
        "ate_rmse": round(rmse, 4),
        "trajectory": traj_path,
        "map_plot": map_path,
    }, indent=2))


if __name__ == "__main__":
    main(*sys.argv[1:])
