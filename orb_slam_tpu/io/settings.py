"""Settings loading: the reference's YAML schema (Data/Settings.yaml).

Replaces cv::FileStorage parsing in main.cc:63-71 / Tracking.cc:52-137.
Accepts both plain YAML and OpenCV-flavored YAML ("%YAML:1.0" header,
which PyYAML rejects). Keys: Camera.{fx,fy,cx,cy,k1,k2,p1,p2,fps,RGB},
ORBextractor.{nFeatures,scaleFactor,nLevels,fastTh,nScoreType},
UseMotionModel."""

from __future__ import annotations

from orb_slam_tpu.frontend.orb_extractor import ORBConfig
from orb_slam_tpu.geometry.camera import CameraModel


def load_settings(path: str) -> dict:
    import yaml

    with open(path) as f:
        text = f.read()
    # strip the OpenCV YAML directive and type tags
    lines = [
        ln for ln in text.splitlines()
        if not ln.startswith("%YAML") and not ln.startswith("---")
    ]
    text = "\n".join(ln.replace("!!opencv-matrix", "") for ln in lines)
    return yaml.safe_load(text) or {}


def slam_config_from_settings(path: str, width: int = 640, height: int = 480):
    """Build (CameraModel, ORBConfig, extras) from a settings YAML."""
    raw = load_settings(path)
    g = lambda k, d: raw.get(k, d)
    cam = CameraModel.create(
        fx=g("Camera.fx", 500.0), fy=g("Camera.fy", 500.0),
        cx=g("Camera.cx", width / 2), cy=g("Camera.cy", height / 2),
        k1=g("Camera.k1", 0.0), k2=g("Camera.k2", 0.0),
        p1=g("Camera.p1", 0.0), p2=g("Camera.p2", 0.0),
        width=g("Camera.width", width), height=g("Camera.height", height),
    )
    orb = ORBConfig(
        n_features=int(g("ORBextractor.nFeatures", 1000)),
        scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(g("ORBextractor.nLevels", 8)),
        fast_th_ini=float(g("ORBextractor.fastTh", 20)),
        score_harris=int(g("ORBextractor.nScoreType", 1)) == 0,
    )
    extras = {
        "fps": float(g("Camera.fps", 30.0)),
        "rgb": bool(g("Camera.RGB", 1)),
        "use_motion_model": bool(g("UseMotionModel", 1)),
        "score_type": int(g("ORBextractor.nScoreType", 1)),
    }
    return cam, orb, extras
