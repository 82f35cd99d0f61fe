"""Image pyramid + Gaussian blur (whole-image vector ops).

Replaces ORBextractor::ComputePyramid (reference: src/ORBextractor.cc:781-822)
and the per-level 7x7 GaussianBlur before descriptor sampling (reference:
src/ORBextractor.cc:743). Images are float32 [H, W] in [0, 255]."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(height: int, width: int, n_levels: int, scale_factor: float):
    """Static per-level (H, W) sizes, rounding like the reference."""
    shapes = []
    for lvl in range(n_levels):
        s = 1.0 / (scale_factor ** lvl)
        shapes.append((max(8, int(round(height * s))), max(8, int(round(width * s)))))
    return shapes


def build_pyramid(img, n_levels: int, scale_factor: float):
    """Successive bilinear downscale (each level from the previous, like the
    reference, so interpolation error accumulates identically). Returns a
    list of [H_l, W_l] float32 arrays (static shapes)."""
    H, W = img.shape
    shapes = pyramid_shapes(H, W, n_levels, scale_factor)
    levels = [img]
    for lvl in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[lvl], method="bilinear", antialias=False)
        )
    return levels


def gaussian_kernel1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Matches cv::getGaussianKernel (normalized sampled Gaussian)."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with BORDER_REFLECT_101 (np.pad 'reflect'),
    matching cv::GaussianBlur(7,7,2,2, BORDER_REFLECT_101) used by the
    reference before rBRIEF sampling (src/ORBextractor.cc:743)."""
    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    padded = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    # vertical pass: sum of shifted rows (small k — unrolled adds fuse well)
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(padded, i, img.shape[0], 0)
    padded = jnp.pad(out, ((0, 0), (r, r)), mode="reflect")
    out2 = jnp.zeros_like(img)
    for i in range(ksize):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(padded, i, img.shape[1], 1)
    return out2


def to_grayscale(img):
    """uint8 RGB/BGR [...,H,W,3] or gray [...,H,W] -> float32 [...,H,W].
    Uses the OpenCV RGB2GRAY weights (reference converts with cvtColor,
    src/Tracking.cc:189-197). Accepts leading batch dims; color is
    detected by a trailing channel axis of size 3."""
    img = jnp.asarray(img)
    if img.ndim >= 3 and img.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        return jnp.round(img.astype(jnp.float32) @ w)
    return img.astype(jnp.float32)
