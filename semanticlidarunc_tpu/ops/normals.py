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


# When the tangent vectors are (near-)parallel the cross product is ~0 and
# the *normalized* normal is numerically undefined: its direction is set by
# float rounding, which differs between compile contexts (XLA fuses the
# Scharr conv differently inside lax.map vs inline, so the same scan can get
# opposite normals at such pixels depending on batching). The reference has
# the same degeneracy (cv2 + /(norm+1e-10), src/dataset/utils.py:48-59) and
# emits rounding-defined garbage there; we make those pixels a deterministic
# zero vector instead: undefined when |S_u x S_v| <= tau * |S_u| |S_v|
# (sin of the tangent angle below tau — ~0.006 degrees at 1e-4).
_DEGENERATE_SIN_TAU = 1e-4


@functools.partial(jax.jit, static_argnames=("norm_factor",))
def build_normal_xyz(xyz: jnp.ndarray, norm_factor: float = 0.25) -> jnp.ndarray:
    """Per-pixel surface normals of an (H, W, 3) xyz image.

    normal = -( S_u x S_v ) / ||.||, with S_u, S_v the Scharr tangent vectors
    (reference: src/dataset/utils.py:48-59); numerically undefined normals
    (near-parallel tangents) are zeroed — see _DEGENERATE_SIN_TAU.
    """
    g = scharr_uv(xyz, norm_factor)        # (H, W, 3, 2)
    s_u, s_v = g[..., 0], g[..., 1]        # (H, W, 3) tangent vectors
    normal = -jnp.cross(s_u, s_v)
    n = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    tangent_scale = (jnp.linalg.norm(s_u, axis=-1, keepdims=True)
                     * jnp.linalg.norm(s_v, axis=-1, keepdims=True))
    defined = n > _DEGENERATE_SIN_TAU * tangent_scale
    return jnp.where(defined, normal / (n + 1e-10), 0.0)


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
    s_u, s_v = der[..., 0], der[..., 1]
    normal = -np.cross(s_u, s_v)
    n = np.linalg.norm(normal, axis=2, keepdims=True)
    tangent_scale = (np.linalg.norm(s_u, axis=2, keepdims=True)
                     * np.linalg.norm(s_v, axis=2, keepdims=True))
    defined = n > _DEGENERATE_SIN_TAU * tangent_scale
    return np.where(defined, normal / (n + 1e-10), 0.0).astype(np.float32)
