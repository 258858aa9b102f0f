"""Image loading, grayscale conversion, resizing, undistortion.

Host-side IO (cv2 when available, PIL fallback).  Matches the reference
CLIs' preprocessing: cv::imread + K from focal/center + 2-coefficient
(bundler, main_bundler.cpp:244-284) or negated 1-coefficient (VisualSfM,
main_vsfm.cpp:243-270) radial undistortion via remap.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:                                   # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def load_image(path: str) -> np.ndarray:
    """BGR uint8 HxWx3 (cv::imread convention) or grayscale HxW."""
    if _HAS_CV2:
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img
    from PIL import Image
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[:, :, ::-1].copy()                     # RGB -> BGR


def to_gray(img: np.ndarray) -> np.ndarray:
    """Grayscale like the reference detector input (line3D.cc:1811-1816,
    cvtColor CV_RGB2GRAY on a BGR image — note the reference passes a BGR
    cv::imread image through CV_RGB2GRAY, so R and B weights are swapped;
    we reproduce that)."""
    if img.ndim == 2:
        return img.astype(np.float32)
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    # CV_RGB2GRAY applied to BGR data: treats channel 0 as 'R'
    return (0.299 * b + 0.587 * g + 0.114 * r).astype(np.float32)


def resize(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    if img.shape[1] == new_w and img.shape[0] == new_h:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    from PIL import Image
    if img.dtype == np.uint8:
        return np.asarray(Image.fromarray(img).resize((new_w, new_h),
                                                      Image.BILINEAR))

    # non-uint8: resize in float ('F' mode) — a uint8 coercion would wrap
    # out-of-range values modulo 256 (e.g. 256.2 -> 0, -0.5 -> 255)
    def _one(ch):
        return np.asarray(Image.fromarray(
            np.ascontiguousarray(ch, np.float32), mode="F")
            .resize((new_w, new_h), Image.BILINEAR))

    out = _one(img) if img.ndim == 2 else \
        np.stack([_one(img[..., c]) for c in range(img.shape[2])], axis=-1)
    if np.issubdtype(img.dtype, np.integer):
        info = np.iinfo(img.dtype)
        out = np.clip(np.rint(out), info.min, info.max)
    return out.astype(img.dtype)


def make_K(focal: float, width: int, height: int) -> np.ndarray:
    """K with principal point at the image center (main_bundler.cpp:244-254)."""
    return np.array([[focal, 0.0, width / 2.0],
                     [0.0, focal, height / 2.0],
                     [0.0, 0.0, 1.0]])


def undistort(img: np.ndarray, K: np.ndarray, k1: float,
              k2: float = 0.0) -> np.ndarray:
    """Radial undistortion with coefficients (k1, k2), matching
    cv::initUndistortRectifyMap + remap (main_bundler.cpp:260-284)."""
    if abs(k1) < 1e-12 and abs(k2) < 1e-12:
        return img
    h, w = img.shape[:2]
    if _HAS_CV2:
        coeffs = np.array([k1, k2, 0.0, 0.0], np.float64)
        mx, my = cv2.initUndistortRectifyMap(
            K, coeffs, np.eye(3), K, (w, h), cv2.CV_32FC1)
        return cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT)
    # numpy fallback: same model, bilinear sampling with BORDER_CONSTANT
    # semantics — taps outside the image contribute 0 to the blend (as
    # cv2.remap does), implemented by sampling a zero-padded copy, so the
    # border band matches the cv2 path instead of edge-clamping
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    x = (xs - K[0, 2]) / K[0, 0]
    y = (ys - K[1, 2]) / K[1, 1]
    r2 = x * x + y * y
    scale = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * scale * K[0, 0] + K[0, 2]
    yd = y * scale * K[1, 1] + K[1, 2]
    x0 = np.floor(xd).astype(int)
    y0 = np.floor(yd).astype(int)
    fx = (xd - x0)[..., None] if img.ndim == 3 else (xd - x0)
    fy = (yd - y0)[..., None] if img.ndim == 3 else (yd - y0)
    pad = np.zeros((h + 2, w + 2) + img.shape[2:], np.float64)
    pad[1:h + 1, 1:w + 1] = img
    xp0 = np.clip(x0 + 1, 0, w + 1)
    xp1 = np.clip(x0 + 2, 0, w + 1)
    yp0 = np.clip(y0 + 1, 0, h + 1)
    yp1 = np.clip(y0 + 2, 0, h + 1)
    out = (pad[yp0, xp0] * (1 - fx) * (1 - fy) + pad[yp0, xp1] * fx * (1 - fy) +
           pad[yp1, xp0] * (1 - fx) * fy + pad[yp1, xp1] * fx * fy)
    if np.issubdtype(img.dtype, np.integer):
        out = np.rint(out)
    return out.astype(img.dtype)


def image_size(path: str) -> tuple:
    """(width, height) without decoding pixel data (PIL lazy open)."""
    from PIL import Image
    with Image.open(path) as im:
        return im.size
