"""Surface normals from an xyz range image via Scharr derivatives.

Reference computes per-channel Scharr derivatives with OpenCV and crosses them
(/root/reference/src/dataset/utils.py:30-59). Here the six derivative maps are
one grouped `lax.conv_general_dilated` over a (H, W, 3) image with
REFLECT_101 padding (cv2's default border), fully fused by XLA — no cv2 on the
hot path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _scharr_kernels(scale: float) -> np.ndarray:
    """(3, 3, 2) correlation kernels: [..., 0] = d/du (width), [..., 1] = d/dv."""
    smooth = np.array([3.0, 10.0, 3.0])
    deriv = np.array([-1.0, 0.0, 1.0])
    kx = np.outer(smooth, deriv) * scale      # derivative along width (x)
    ky = np.outer(deriv, smooth) * scale      # derivative along height (y)
    return np.stack([kx, ky], axis=-1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("norm_factor",))
def scharr_uv(img: jnp.ndarray, norm_factor: float = 0.25) -> jnp.ndarray:
    """Scharr derivatives of an (H, W, C) image.

    Returns (H, W, C, 2): [..., 0] = d/du (width), [..., 1] = d/dv (height),
    matching `cv2.Scharr(src, CV_32F, 1, 0, scale=1/norm_factor)` /
    `cv2.Scharr(src, CV_32F, 0, 1, scale=1/norm_factor)` with BORDER_DEFAULT.
    """
    h, w, c = img.shape
    x = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    x = x.transpose(2, 0, 1)[None]                       # (1, C, H+2, W+2)
    # depthwise conv: feature_group_count=C, 2 outputs per input channel.
    # Group g covers output channels [2g, 2g+1], each seeing input channel g,
    # so the kernels must be interleaved (du, dv) per channel.
    k = _scharr_kernels(1.0 / norm_factor)               # (3, 3, 2)
    kern = np.zeros((2 * c, 1, 3, 3), np.float32)
    for ch in range(c):
        kern[2 * ch, 0] = k[:, :, 0]
        kern[2 * ch + 1, 0] = k[:, :, 1]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(kern),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]                                                 # (2C, H, W)
    # XLA "convolution" is cross-correlation (no kernel flip), which is exactly
    # cv2.filter2D / cv2.Scharr semantics — no sign fixup needed.
    du = out[0::2].transpose(1, 2, 0)
    dv = out[1::2].transpose(1, 2, 0)
    return jnp.stack([du, dv], axis=-1)


@functools.partial(jax.jit, static_argnames=("norm_factor",))
def build_normal_xyz(xyz: jnp.ndarray, norm_factor: float = 0.25) -> jnp.ndarray:
    """Per-pixel surface normals of an (H, W, 3) xyz image.

    normal = -( S_u x S_v ) / ||.||, with S_u, S_v the Scharr tangent vectors
    (reference: src/dataset/utils.py:48-59).
    """
    g = scharr_uv(xyz, norm_factor)        # (H, W, 3, 2)
    sx_u, sx_v = g[..., 0, 0], g[..., 0, 1]
    sy_u, sy_v = g[..., 1, 0], g[..., 1, 1]
    sz_u, sz_v = g[..., 2, 0], g[..., 2, 1]
    normal = -jnp.stack([
        sy_u * sz_v - sz_u * sy_v,
        sz_u * sx_v - sz_v * sx_u,
        sx_u * sy_v - sy_u * sx_v,
    ], axis=-1)
    n = jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-10
    return normal / n


def build_normal_xyz_np(xyz: np.ndarray, norm_factor: float = 0.25) -> np.ndarray:
    """Numpy golden twin of `build_normal_xyz` (pure numpy, no cv2)."""
    k = _scharr_kernels(1.0 / norm_factor)
    pad = np.pad(xyz.astype(np.float32), ((1, 1), (1, 1), (0, 0)), mode="reflect")
    h, w, _ = xyz.shape
    der = np.zeros((h, w, 3, 2), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = pad[dy:dy + h, dx:dx + w, :]
            for d in range(2):
                der[..., d] += patch * k[dy, dx, d]
    sx_u, sx_v = der[..., 0, 0], der[..., 0, 1]
    sy_u, sy_v = der[..., 1, 0], der[..., 1, 1]
    sz_u, sz_v = der[..., 2, 0], der[..., 2, 1]
    normal = -np.dstack([
        sy_u * sz_v - sz_u * sy_v,
        sz_u * sx_v - sz_v * sx_u,
        sx_u * sy_v - sy_u * sx_v,
    ])
    n = np.linalg.norm(normal, axis=2) + 1e-10
    return normal / n[..., None]
