"""Interactive inspection panel (host-side OpenCV UI).

Same capability as the reference's checkbox panel
(/root/reference/src/utils/viz_panel.py) — lazily built optional layers,
click-to-toggle checkboxes, zoom hotkeys, a headless-safe singleton, and a
'q' hotkey popping the scan into an Open3D point-cloud view — but a
different design rather than a port:

- Layer state lives in a ``LayerDeck`` (ordered name -> on/off with sticky
  defaults); rendering takes *suppliers* (arrays or thunks) and asks the
  deck which ones to realize, so disabled layers are never computed.
- The frame is composed in DISPLAY space: the image column is scaled by the
  zoom, then a sidebar rendered at native resolution is attached (text and
  checkboxes stay crisp at any zoom). Each frame yields a flat list of
  ``(x0, y0, x1, y1, action)`` hit regions already in display coordinates,
  so the mouse callback is a plain point-in-rect scan with no inverse
  transform bookkeeping.
- Zoom is an integer step counter (scale = fit * 1.05**steps), reset by '0'.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple, Union

import numpy as np

from .viz import ensure_o3d_runtime, has_display

Supplier = Union[np.ndarray, Callable[[], np.ndarray]]


class LayerDeck:
    """Ordered on/off state for named layers, persistent across frames.

    Names keep their first-seen order; re-registering is a no-op. ``default``
    only applies to names whose state was never set, so user toggles stick.
    """

    def __init__(self):
        self._on: Dict[str, bool] = {}
        self._order: List[str] = []

    def register(self, name: str, default_on: bool = True):
        if name not in self._on:
            self._on[name] = bool(default_on)
            self._order.append(name)

    def prune(self, keep: Iterable[str]):
        keep = set(keep)
        self._order = [n for n in self._order if n in keep]
        self._on = {n: v for n, v in self._on.items() if n in keep}

    def set(self, name: str, on: bool):
        self.register(name, on)
        self._on[name] = bool(on)

    def toggle(self, name: str):
        if name in self._on:
            self._on[name] = not self._on[name]

    def is_on(self, name: str) -> bool:
        return self._on.get(name, False)

    def names(self) -> List[str]:
        return list(self._order)


def _fit_width(images: List[np.ndarray]) -> np.ndarray:
    """Vertically concatenate, shrinking wider images to the narrowest."""
    import cv2
    if not images:
        return np.zeros((2, 2, 3), np.uint8)
    target = min(im.shape[1] for im in images)
    rows = []
    for im in images:
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, axis=-1)
        if im.shape[1] != target:
            h = max(1, int(round(im.shape[0] * target / im.shape[1])))
            im = cv2.resize(im, (target, h), interpolation=cv2.INTER_NEAREST)
        rows.append(im)
    return np.concatenate(rows, axis=0)


class InspectionPanel:
    """Image column + native-resolution checkbox sidebar, in one cv2 window."""

    ZOOM_BASE = 1.05

    def __init__(self, window: str = "inf",
                 display_budget: Tuple[int, int] = (1280, 800),
                 interactive: bool = True):
        self.window = window
        self.budget_w, self.budget_h = display_budget
        self.deck = LayerDeck()
        self._zoom_steps = 0
        self._fit: Optional[float] = None
        self._hits: List[Tuple[int, int, int, int, Callable[[], None]]] = []
        self._interactive = bool(interactive)
        self._window_open = False

    # ---- window / events ----
    def _open_window(self):
        if self._window_open or not self._interactive:
            return
        import cv2
        cv2.namedWindow(self.window,
                        cv2.WINDOW_AUTOSIZE | cv2.WINDOW_GUI_NORMAL)
        cv2.setMouseCallback(self.window, self._mouse_event)
        self._window_open = True

    def close(self):
        if self._window_open:
            import cv2
            try:
                cv2.destroyWindow(self.window)
            except Exception:
                pass
            self._window_open = False

    def _mouse_event(self, event, x, y, *_):
        import cv2
        if event != cv2.EVENT_LBUTTONDOWN:
            return
        for x0, y0, x1, y1, action in self._hits:
            if x0 <= x <= x1 and y0 <= y <= y1:
                action()
                return

    def handle_key(self, key: int):
        if key in (ord("+"), ord("=")):
            self._zoom_steps = min(29, self._zoom_steps + 1)
        elif key == ord("-"):
            self._zoom_steps = max(-29, self._zoom_steps - 1)
        elif key == ord("0"):
            self._zoom_steps = 0

    def invalidate_fit(self):
        """Recompute the fit scale next frame (input shape changed)."""
        self._fit = None

    # ---- sidebar ----
    def _sidebar(self, min_h: int) -> np.ndarray:
        import cv2
        font, fs = cv2.FONT_HERSHEY_SIMPLEX, 0.5
        names = self.deck.names()
        text_w = max((cv2.getTextSize(n, font, fs, 1)[0][0] for n in names),
                     default=50)
        row_h, box, margin = 26, 16, 10
        w = int(np.clip(margin * 3 + box + text_w, 130, 400))
        h = max(min_h, margin + 34 + row_h * len(names) + margin)
        bar = np.full((h, w, 3), 30, np.uint8)
        cv2.putText(bar, "layers", (margin, margin + 20), font, 0.8,
                    (235, 235, 235), 2, cv2.LINE_AA)
        y = margin + 40
        for name in names:
            tl = (margin, y)
            br = (margin + box, y + box)
            cv2.rectangle(bar, tl, br, (190, 190, 190), 1)
            if self.deck.is_on(name):
                cv2.rectangle(bar, (tl[0] + 4, tl[1] + 4),
                              (br[0] - 4, br[1] - 4), (80, 215, 80), -1)
            cv2.putText(bar, name, (br[0] + margin, y + box - 3), font, fs,
                        (220, 220, 220), 1, cv2.LINE_AA)

            def _flip(n=name):
                self.deck.toggle(n)

            # display coords: sidebar sits right of the scaled image column,
            # whose width is stamped in by frame() after composition
            self._hits.append((tl[0], tl[1], br[0], br[1], _flip))
            y += row_h
        return bar

    # ---- frame ----
    def frame(self, suppliers: Dict[str, Supplier],
              lazy: Optional[Dict[str, Callable[[], np.ndarray]]] = None,
              scale: float = 1.5) -> np.ndarray:
        """Compose and (if interactive) show one frame; returns the canvas.

        ``suppliers`` register on by default, ``lazy`` ones off unless
        pre-registered. Thunks run only for layers currently on.
        """
        import cv2
        self._open_window()
        lazy = lazy or {}
        for n in suppliers:
            self.deck.register(n, True)
        for n in lazy:
            self.deck.register(n, False)
        self.deck.prune(list(suppliers) + list(lazy))

        shown = []
        for n in self.deck.names():
            if not self.deck.is_on(n):
                continue
            src = suppliers.get(n, lazy.get(n))
            shown.append(src() if callable(src) else src)
        column = _fit_width(shown)

        if self._fit is None:
            self._fit = scale * min(1.0, self.budget_w / column.shape[1],
                                    self.budget_h / column.shape[0])
        z = self._fit * (self.ZOOM_BASE ** self._zoom_steps)
        disp_w = max(2, int(round(column.shape[1] * z)))
        disp_h = max(2, int(round(column.shape[0] * z)))
        column = cv2.resize(column, (disp_w, disp_h),
                            interpolation=cv2.INTER_NEAREST)

        self._hits = []
        bar = self._sidebar(disp_h)
        if bar.shape[0] > disp_h:
            column = np.concatenate(
                [column, np.full((bar.shape[0] - disp_h, disp_w, 3), 26,
                                 np.uint8)], axis=0)
        canvas = np.concatenate([column, bar], axis=1)
        # shift sidebar-local hit rects into display coordinates
        self._hits = [(x0 + disp_w, y0, x1 + disp_w, y1, a)
                      for (x0, y0, x1, y1, a) in self._hits]
        if self._window_open:
            cv2.imshow(self.window, canvas)
        return canvas


_SINGLETON: Optional[InspectionPanel] = None


def get_panel() -> InspectionPanel:
    global _SINGLETON
    if _SINGLETON is None:
        _SINGLETON = InspectionPanel(interactive=has_display())
    return _SINGLETON


def destroy_panel():
    global _SINGLETON
    if _SINGLETON is not None:
        _SINGLETON.close()
        _SINGLETON = None


def register_optional_names(names, default_enabled: bool = False):
    panel = get_panel()
    for n in names:
        panel.deck.register(n, default_enabled)
    panel.invalidate_fit()


def show_point_cloud(xyz: np.ndarray, color_bgr: np.ndarray):
    """Open3D point-cloud popup (reference 'q' behavior); no-op headless."""
    try:
        import open3d as o3d
        if not has_display():
            return
        ensure_o3d_runtime()
        cloud = o3d.geometry.PointCloud()
        cloud.points = o3d.utility.Vector3dVector(
            np.asarray(xyz, np.float64).reshape(-1, 3))
        rgb = np.asarray(color_bgr)[..., ::-1].reshape(-1, 3) / 255.0
        cloud.colors = o3d.utility.Vector3dVector(rgb.astype(np.float64))
        axes = o3d.geometry.TriangleMesh.create_coordinate_frame()
        o3d.visualization.draw_geometries([axes, cloud])
    except Exception:
        pass


def create_ia_plots(base_images_dict, optional_builders, args_o3d,
                    enable: bool = True, scale: float = 1.5):
    """Render one interactive frame; 'q' pops an Open3D point-cloud view."""
    if not enable:
        destroy_panel()
        return
    import cv2
    panel = get_panel()
    panel.frame(base_images_dict, optional_builders, scale)
    if not panel._window_open:
        return
    key = cv2.waitKey(1) & 0xFF
    if key != 0xFF:
        panel.handle_key(key)
    if key == ord("q"):
        show_point_cloud(*args_o3d)
