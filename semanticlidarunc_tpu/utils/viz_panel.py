"""Interactive OpenCV inspection panel with lazy layer builders.

Capability port of /root/reference/src/utils/viz_panel.py: a vertical image
stack with a right-side checkbox column; optional layers are *built only when
ticked* (so e.g. Dirichlet uncertainty maps are computed lazily), +/-/0 zoom,
mouse hit-testing through the display resize, a headless-safe singleton, and
a 'q' hotkey that pops the scan out into an Open3D point-cloud view.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from .viz import ensure_o3d_runtime, has_display


def _stack_vertical(images: List[np.ndarray]) -> np.ndarray:
    import cv2
    if not images:
        return np.zeros((1, 2, 3), np.uint8)
    w = min(im.shape[1] for im in images)
    out = []
    for im in images:
        if im.shape[1] != w:
            nh = int(round(im.shape[0] * w / max(1, im.shape[1])))
            im = cv2.resize(im, (w, nh), interpolation=cv2.INTER_NEAREST)
        out.append(im)
    return np.vstack(out)


class VizPanel:
    ROW_H, BOX, PAD = 28, 18, 12

    def __init__(self, window_name: str = "inf",
                 max_window: Tuple[int, int] = (1280, 800),
                 create_window: bool = True):
        self.window = window_name
        self.max_w, self.max_h = max_window
        self.enabled: Dict[str, bool] = {}
        self.order: List[str] = []
        self.hit_boxes: Dict[str, Tuple[int, int, int, int]] = {}
        self._base_eff: Optional[float] = None
        self._user_scale = 1.0
        self._window_created = False
        self._want_window = bool(create_window)
        self._mouse = {"sx": 1.0, "sy": 1.0, "x0": 0}

    # ---- state ----
    def set_default_enabled(self, defaults: Dict[str, bool]):
        for n, v in defaults.items():
            self.enabled.setdefault(n, bool(v))

    def refit_next_frame(self):
        self._base_eff = None

    def handle_key(self, key: int):
        if key in (ord("+"), ord("=")):
            self._user_scale = min(4.0, self._user_scale * 1.05)
        elif key == ord("-"):
            self._user_scale = max(0.25, self._user_scale / 1.05)
        elif key == ord("0"):
            self._user_scale = 1.0

    def destroy(self):
        if self._window_created:
            import cv2
            try:
                cv2.destroyWindow(self.window)
            except Exception:
                pass
            self._window_created = False

    # ---- internals ----
    def _ensure_window(self):
        if self._window_created or not self._want_window:
            return
        import cv2
        cv2.namedWindow(self.window, cv2.WINDOW_AUTOSIZE | cv2.WINDOW_GUI_NORMAL)
        cv2.setMouseCallback(self.window, self._on_mouse)
        self._window_created = True

    def _on_mouse(self, event, x, y, flags, userdata):
        import cv2
        if event != cv2.EVENT_LBUTTONDOWN:
            return
        x0 = int(round(x / max(1e-12, self._mouse["sx"])))
        y0 = int(round(y / max(1e-12, self._mouse["sy"])))
        if x0 < self._mouse["x0"]:
            return
        for name, (bx1, by1, bx2, by2) in self.hit_boxes.items():
            if bx1 <= x0 <= bx2 and by1 <= y0 <= by2:
                self.enabled[name] = not self.enabled.get(name, True)
                return

    def _panel_img(self, height: int, x_off: int) -> np.ndarray:
        import cv2
        font = cv2.FONT_HERSHEY_SIMPLEX
        width = max(140, min(420, self.PAD + self.BOX + 20 + max(
            (cv2.getTextSize(p, font, 0.7, 1)[0][0]
             for n in self.order for p in n.split("_")), default=60)))
        panel = np.full((height, width, 3), 34, np.uint8)
        cv2.putText(panel, "Layers", (self.PAD, 36), font, 1.2,
                    (240, 240, 240), 2, cv2.LINE_AA)
        self.hit_boxes.clear()
        y = 64
        for name in self.order:
            bx1, by1 = self.PAD, y - self.BOX + 5
            bx2, by2 = bx1 + self.BOX, by1 + self.BOX
            self.hit_boxes[name] = (x_off + bx1, by1, x_off + bx2, by2)
            cv2.rectangle(panel, (bx1, by1), (bx2, by2), (200, 200, 200), 1)
            if self.enabled.get(name, True):
                cv2.line(panel, (bx1 + 3, by1 + 9), (bx1 + 7, by1 + 13),
                         (72, 220, 72), 2)
                cv2.line(panel, (bx1 + 7, by1 + 13), (bx1 + 14, by1 + 5),
                         (72, 220, 72), 2)
            cv2.putText(panel, name, (bx2 + 8, y), font, 0.55,
                        (225, 225, 225), 1, cv2.LINE_AA)
            y += self.ROW_H
        return panel

    # ---- render ----
    def render_with_builders(
            self,
            base_sources: Dict[str, Union[np.ndarray, Callable[[], np.ndarray]]],
            optional_builders: Dict[str, Callable[[], np.ndarray]],
            scale: float = 1.5) -> np.ndarray:
        import cv2
        self._ensure_window()
        current = list(base_sources) + list(optional_builders)
        self.order = [n for n in self.order if n in current] + \
            [n for n in current if n not in self.order]
        for n in list(self.enabled):
            if n not in current:
                del self.enabled[n]
        for n in current:
            self.enabled.setdefault(n, True)

        imgs = []
        for n in self.order:
            if not self.enabled.get(n, True):
                continue
            src = base_sources.get(n, optional_builders.get(n))
            imgs.append(src() if callable(src) else src)
        left = _stack_vertical(imgs)
        lh, lw = left.shape[:2]
        panel_h = 64 + len(self.order) * self.ROW_H + 12
        h = max(lh, panel_h)
        if lh < h:
            left = np.vstack([left, np.full((h - lh, lw, 3), 32, np.uint8)])
        panel = self._panel_img(h, lw)
        composed0 = np.hstack([left, panel])

        if self._base_eff is None:
            cw, ch = composed0.shape[1], composed0.shape[0]
            self._base_eff = min(1.0, self.max_w / cw, self.max_h / ch) * scale
        eff = self._base_eff * self._user_scale
        dw = int(round(composed0.shape[1] * eff))
        dh = int(round(composed0.shape[0] * eff))
        composed = cv2.resize(composed0, (dw, dh),
                              interpolation=cv2.INTER_NEAREST)
        self._mouse = {"sx": dw / composed0.shape[1],
                       "sy": dh / composed0.shape[0], "x0": lw}
        if self._window_created:
            cv2.imshow(self.window, composed)
        return composed


_PANEL: Optional[VizPanel] = None


def get_panel() -> VizPanel:
    global _PANEL
    if _PANEL is None:
        _PANEL = VizPanel(create_window=has_display())
    return _PANEL


def destroy_panel():
    global _PANEL
    if _PANEL is not None:
        _PANEL.destroy()
        _PANEL = None


def register_optional_names(names, default_enabled: bool = False):
    p = get_panel()
    p.set_default_enabled({n: bool(default_enabled) for n in names})
    p.refit_next_frame()


def create_ia_plots(base_images_dict, optional_builders, args_o3d,
                    enable: bool = True, scale: float = 1.5):
    """Render one interactive frame; 'q' pops an Open3D point-cloud view."""
    if not enable:
        destroy_panel()
        return
    import cv2
    panel = get_panel()
    panel.render_with_builders(base_images_dict, optional_builders, scale)
    if not panel._window_created:
        return
    key = cv2.waitKey(1) & 0xFF
    if key != 0xFF:
        panel.handle_key(key)
    if key == ord("q"):
        try:
            import open3d as o3d
            if not has_display():
                return
            ensure_o3d_runtime()
            xyz, color_bgr = args_o3d
            pcd = o3d.geometry.PointCloud()
            pcd.points = o3d.utility.Vector3dVector(
                np.asarray(xyz).reshape(-1, 3))
            rgb = np.asarray(color_bgr)[..., ::-1].reshape(-1, 3) / 255.0
            pcd.colors = o3d.utility.Vector3dVector(rgb.astype(np.float64))
            mesh = o3d.geometry.TriangleMesh.create_coordinate_frame()
            o3d.visualization.draw_geometries([mesh, pcd])
        except Exception:
            pass
