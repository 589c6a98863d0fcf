"""Test-image loading.

The reference ships 8 grayscale 512² PNGs (`images/`: barbara, boat, bridge,
goldhill, lake, man, mandrill, wheel) plus a 256² cameraman, and the demos
default to wheel.png (run_Gaussian_demo.m:100).  The same public images are
vendored in `data/images/` (see its README for provenance), so a clean
clone reproduces the parity tables out of the box:

  * `load_image(name_or_path)` loads any grayscale PNG — search order is an
    explicit directory argument, then SEMIBLIND_TV_IMAGES, then the
    vendored `data/images/`.
  * `synthetic_wheel(size)` generates a deterministic spoked-wheel
    resolution-chart phantom with the same character (sharp radial edges,
    flat regions, fine detail near the hub) for self-contained runs/tests.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["load_image", "synthetic_wheel", "available_images"]

_DEFAULT_DIRS = (
    os.environ.get("SEMIBLIND_TV_IMAGES", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "images"),
)


def _search_dirs(image_dir: Optional[str]):
    dirs = [image_dir] if image_dir else []
    dirs += [d for d in _DEFAULT_DIRS if d]
    return [d for d in dirs if os.path.isdir(d)]


def available_images(image_dir: Optional[str] = None):
    names = set()
    for d in _search_dirs(image_dir):
        for f in os.listdir(d):
            if f.lower().endswith(".png"):
                names.add(os.path.splitext(f)[0])
    return sorted(names)


def load_image(name: str, image_dir: Optional[str] = None, size: int = 512) -> np.ndarray:
    """Load a grayscale image as float64 in [0, 255] (MATLAB double(imread))."""
    candidates = []
    if os.path.isfile(name):
        candidates.append(name)
    for d in _search_dirs(image_dir):
        candidates.append(os.path.join(d, name))
        candidates.append(os.path.join(d, name + ".png"))
    for path in candidates:
        if os.path.isfile(path):
            from PIL import Image

            img = Image.open(path).convert("L")
            return np.asarray(img, dtype=np.float64)
    if name in ("wheel", "synthetic", "synthetic_wheel"):
        return synthetic_wheel(size)
    raise FileNotFoundError(
        f"image {name!r} not found; set SEMIBLIND_TV_IMAGES to a directory of "
        f"grayscale PNGs or use the built-in 'wheel' phantom"
    )


def synthetic_wheel(size: int = 512, n_spokes: int = 36, soften: float = 1.2) -> np.ndarray:
    """Deterministic spoked-wheel resolution phantom in [0, 255].

    `soften` applies a mild optical-softness blur (std in absolute pixels —
    the 7×7 PSF is size-independent) plus low-amplitude deterministic texture so the
    phantom's gradient statistics resemble a *photographed* chart (like the
    reference's wheel.png) rather than a binary mask.  Razor-sharp binary
    edges are adversarial for semi-blind PSF estimation — the posterior
    stays sharp and the kernel-width gradient biases toward no-blur — which
    is an image-property, not an implementation property (pass soften=0 to
    reproduce it).
    """
    c = (size - 1) / 2.0
    yy, xx = np.mgrid[0:size, 0:size]
    dx, dy = xx - c, yy - c
    r = np.hypot(dx, dy)
    ang = np.arctan2(dy, dx)
    spokes = 0.5 * (1.0 + np.sign(np.sin(n_spokes * ang)))
    img = spokes.copy()
    rim_outer = 0.47 * size
    rim_inner = 0.43 * size
    img[(r <= rim_outer) & (r >= rim_inner)] = 1.0
    img[r > rim_outer] = 0.0
    hub = 0.06 * size
    img[r < hub] = 1.0
    img[r < 0.5 * hub] = 0.0
    if soften > 0:
        from scipy.ndimage import gaussian_filter

        img = gaussian_filter(img, soften, mode="wrap")
        # deterministic low-amplitude texture (smooth harmonics)
        tex = 0.04 * (
            np.sin(2 * np.pi * 7 * xx / size) * np.sin(2 * np.pi * 5 * yy / size)
            + 0.5 * np.sin(2 * np.pi * 13 * (xx + yy) / size)
        )
        img = np.clip(img + tex, 0.0, 1.0)
    return (255.0 * img).astype(np.float64)
