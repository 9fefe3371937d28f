r"""Host-side visualization utilities (parity with reference
``experiments/kolmogorov/utils.py:84-200``): signed-power icefire rendering
of vorticity/PV fields, grid montages with observation-mask overlays,
diagonal "sandwich" stacks, and GIFs. Shared by the Kolmogorov and
quasi-geostrophic experiment packs."""

from pathlib import Path

import numpy as np

def vorticity2rgb(w, vmin: float = -1.25, vmax: float = 1.25) -> np.ndarray:
    r"""Signed-power icefire colormap of a vorticity field."""

    import seaborn

    w = np.asarray(w)
    w = (w - vmin) / (vmax - vmin)
    w = 2 * w - 1
    w = np.sign(w) * np.abs(w) ** 0.8
    w = (w + 1) / 2
    w = seaborn.cm.icefire(w)
    w = 256 * w[..., :3]

    return w.astype(np.uint8)


def draw(w, mask=None, pad: int = 4, zoom: int = 1, **kwargs):
    r"""Grid montage of vorticity fields with optional observation-mask
    overlay (unobserved pixels are greyed out). Pure-numpy compositing."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)
    w = w[(None,) * (5 - w.ndim)]
    rows, cols, h, width, _ = w.shape

    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        mask = np.broadcast_to(mask, (rows, cols, h, width))
        w = np.where(mask[..., None], w, np.uint8(240))

    canvas = np.full(
        (rows * (h + pad) + pad, cols * (width + pad) + pad, 3),
        255,
        dtype=np.uint8,
    )

    for i in range(rows):
        for j in range(cols):
            top = i * (h + pad) + pad
            left = j * (width + pad) + pad
            canvas[top : top + h, left : left + width] = w[i, j]

    if zoom > 1:
        canvas = np.repeat(np.repeat(canvas, zoom, axis=0), zoom, axis=1)

    return Image.fromarray(canvas)


def sandwich(w, offset: int = 5, border: int = 1, mirror: bool = False,
             zoom: int = 1, **kwargs):
    r"""Diagonally-stacked rendering of a trajectory, later frames in front
    with a white border. Pure-numpy compositing."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)
    if zoom > 1:
        w = w.repeat(zoom, axis=1).repeat(zoom, axis=2)
        offset, border = zoom * offset, zoom * border
    n, h, width, _ = w.shape

    if mirror:
        w = w[:, :, ::-1]

    canvas = np.full(
        (h + (n - 1) * offset, width + (n - 1) * offset, 3),
        255,
        dtype=np.uint8,
    )

    for i in range(n):
        top, left = i * offset, i * offset
        canvas[max(top - border, 0):, max(left - border, 0):] = 255
        canvas[top : top + h, left : left + width] = w[i]

    if mirror:
        canvas = canvas[:, ::-1]

    return Image.fromarray(canvas)


def save_gif(w, file: Path, dt: float = 0.2, zoom: int = 1, **kwargs) -> None:
    r"""Animated GIF of a vorticity trajectory (reference
    ``experiments/kolmogorov/utils.py:184-200``)."""

    from PIL import Image

    w = vorticity2rgb(w, **kwargs)
    if zoom > 1:
        w = w.repeat(zoom, axis=1).repeat(zoom, axis=2)

    imgs = [Image.fromarray(frame) for frame in w]
    imgs[0].save(
        file,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 * dt),
        loop=0,
    )
