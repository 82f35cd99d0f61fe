"""nScoreType=0 (Harris rescoring, reference src/ORBextractor.cc:616-620)
must run on the default TPU (Pallas) extractor configuration: the
constructor routes Harris to the XLA stacked detector at config time
instead of raising at trace time (VERDICT r4 #7)."""

import warnings

import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor


def _textured(h=240, w=320, seed=3):
    rng = np.random.default_rng(seed)
    img = rng.uniform(40, 60, (h, w)).astype(np.float32)
    for _ in range(160):
        y, x = int(rng.integers(8, h - 8)), int(rng.integers(8, w - 8))
        s = int(rng.integers(2, 5))
        img[y - s:y + s, x - s:x + s] = float(rng.uniform(0, 255))
    return img


def test_harris_on_pallas_config_falls_back_and_runs():
    cfg = ORBConfig(n_features=300, score_harris=True)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ex = ORBExtractor(cfg, use_pallas=True)
    assert ex.use_pallas is False, "Harris must route to the XLA detector"
    assert any("Harris" in str(r.message) for r in rec)
    feats = ex(jnp.asarray(_textured()))
    assert int(jnp.sum(feats.valid)) > 50


def test_nscoretype_yaml_wiring(tmp_path):
    """nScoreType: 0 in the reference settings schema flows into
    ORBConfig.score_harris (Data/Settings.yaml analog)."""
    y = tmp_path / "settings.yaml"
    y.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 200.0\nCamera.fy: 200.0\n"
        "Camera.cx: 160.0\nCamera.cy: 120.0\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        "Camera.fps: 30.0\nCamera.width: 320\nCamera.height: 240\n"
        "ORBextractor.nFeatures: 300\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 8\nORBextractor.fastTh: 20\n"
        "ORBextractor.nScoreType: 0\n")
    from orb_slam_tpu.io.settings import slam_config_from_settings
    cam, orb, extras = slam_config_from_settings(str(y))
    assert orb.score_harris is True
    ex = ORBExtractor(orb, use_pallas=True)  # must not raise
    assert ex.use_pallas is False
    feats = ex(jnp.asarray(_textured()))
    assert int(jnp.sum(feats.valid)) > 50
