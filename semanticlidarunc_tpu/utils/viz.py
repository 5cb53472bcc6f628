"""Host-side visualization: class-color rendering, uncertainty layers,
colorbars, image-stack windows.

Port of /root/reference/src/utils/vis_cv2.py, viz_env_utils.py, and the
uncertainty-layer builders of models/probability_helper.py:251-335. All
functions are numpy-in/numpy-out; windowing is gated on a display being
available so everything is headless-safe (the reference's has_display gate).
The uncertainty maps themselves come off-device as small float arrays; only
colormapping happens here.
"""
from __future__ import annotations

import os

import numpy as np


def has_display() -> bool:
    return bool(os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY"))


def ensure_o3d_runtime():
    """Open3D needs XDG_RUNTIME_DIR on Wayland; create a private one."""
    import getpass
    path = os.environ.get("XDG_RUNTIME_DIR")
    if not path:
        path = f"/tmp/runtime-{getpass.getuser()}"
        os.environ["XDG_RUNTIME_DIR"] = path
    os.makedirs(path, exist_ok=True)
    os.chmod(path, 0o700)


def colorize_labels(mask: np.ndarray, class_colors: dict) -> np.ndarray:
    """2D class-id mask -> BGR uint8 image via a LUT gather (vectorized,
    vs the reference's per-class boolean loop, vis_cv2.py:28-43)."""
    lut = np.zeros((256, 3), np.uint8)
    for cid, col in class_colors.items():
        if 0 <= cid < 256:
            lut[cid] = col
    return lut[np.clip(mask, 0, 255).astype(np.uint8)]


def colorize_map(x: np.ndarray, clip=(0.02, 0.98),
                 mask: np.ndarray | None = None) -> np.ndarray:
    """Quantile-normalized turbo colormap of a scalar [H, W] map
    (probability_helper.py:251-271)."""
    import cv2
    x = np.asarray(x, np.float32)
    lo, hi = np.quantile(x, clip[0]), np.quantile(x, clip[1])
    if hi <= lo:
        lo, hi = x.min(), x.max() + 1e-6
    xn = np.clip((x - lo) / (hi - lo + 1e-12), 0, 1)
    img = cv2.applyColorMap((xn * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
    if mask is not None:
        img[mask[:, 0], mask[:, 1]] = [0, 0, 0]
    return img


def colorize_signed(x: np.ndarray, clip=(-1.0, 1.0),
                    mask: np.ndarray | None = None) -> np.ndarray:
    import cv2
    lo, hi = clip
    xn = np.clip((np.asarray(x, np.float32) - lo) / (hi - lo + 1e-12), 0, 1)
    img = cv2.applyColorMap((xn * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
    if mask is not None:
        img[mask[:, 0], mask[:, 1]] = [0, 0, 0]
    return img


def build_uncertainty_layers(alpha, names: list[str], idx: int = 0,
                             mask: np.ndarray | None = None) -> dict:
    """Lazily build the ticked uncertainty layers from an alpha map
    ([B, H, W, C]); mirrors probability_helper.py:294-335."""
    import jax.numpy as jnp
    from ..prob import dirichlet as pdl

    a = jnp.asarray(alpha)[idx][None]
    out = {}
    if "H_norm" in names:
        out["H_norm"] = colorize_map(
            np.asarray(pdl.predictive_entropy_norm(a))[0], mask=mask)
    if "AU_norm" in names:
        out["AU_norm"] = colorize_map(
            np.asarray(pdl.aleatoric_uncertainty_norm(a))[0], mask=mask)
    if "EU_norm" in names:
        out["EU_norm"] = colorize_map(
            np.asarray(pdl.epistemic_uncertainty_norm(a))[0], mask=mask)
    if "alpha0" in names:
        out["alpha0"] = colorize_map(
            np.asarray(a.sum(-1))[0], mask=mask)
    if "AU_frac" in names:
        out["AU_frac"] = colorize_map(
            np.asarray(pdl.aleatoric_fraction(a, min_h=1e-6))[0], mask=mask)
    if "EU_frac" in names:
        out["EU_frac"] = colorize_map(
            np.asarray(pdl.epistemic_fraction(a, min_h=1e-6))[0], mask=mask)
    if "EU_minus_AU_frac" in names:
        out["EU_minus_AU_frac"] = colorize_signed(
            np.asarray(pdl.eu_minus_au_fraction(a, min_h=1e-6))[0], mask=mask)
    return out


def add_horizontal_uncertainty_colorbar(image: np.ndarray, num_classes: int,
                                        height: int = 20, num_ticks: int = 5,
                                        font_scale: float = 0.7,
                                        thickness: int = 1,
                                        color=(225, 225, 225)) -> np.ndarray:
    """Turbo colorbar strip labeled Certain..Uncertain (vis_cv2.py:5-26)."""
    import cv2
    max_u = np.log(num_classes)
    width = image.shape[1]
    gradient = np.linspace(0, max_u, width).astype(np.float32).reshape(1, -1)
    g255 = np.clip((gradient / max_u) * 255.0, 0, 255).astype(np.uint8)
    bar = cv2.applyColorMap(
        cv2.resize(g255, (width, height), interpolation=cv2.INTER_LINEAR),
        cv2.COLORMAP_TURBO)
    labels = ["Certain", "Confident", "Ambiguous", "Doubtful", "Uncertain"]
    for i in range(num_ticks):
        x = int(i * (width - 1) / (num_ticks - 1))
        label = labels[i]
        ts, _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, font_scale,
                                thickness)
        text_x = x if i <= 2 else x - ts[0]
        cv2.putText(bar, label, (text_x, ts[1]), cv2.FONT_HERSHEY_SIMPLEX,
                    font_scale, color, thickness, lineType=cv2.LINE_AA)
    return np.concatenate((image, bar), axis=0)


def show_stack(images, scale: float = 1.5, name: str = "inf",
               max_window=(1280, 800)):
    """Vertically stack equally-wide BGR images and show (display-gated)."""
    img = np.vstack(images)
    h, w = img.shape[:2]
    if h % 2:
        img = img[:-1]
    if w % 2:
        img = img[:, :-1]
    if not has_display():
        return img
    import cv2
    h, w = img.shape[:2]
    req_w, req_h = int(round(w * scale)), int(round(h * scale))
    cap = min(max_window[0] / max(req_w, 1), max_window[1] / max(req_h, 1), 1.0)
    eff = scale * cap
    if eff != 1.0:
        img = cv2.resize(img, (int(w * eff), int(h * eff)),
                         interpolation=cv2.INTER_NEAREST)
    cv2.imshow(name, img)
    return img
