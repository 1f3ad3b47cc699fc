"""Image/video IO: grids, per-image dumps, collages, videos, GIFs.

Rebuild of the reference IO helpers (``modules/utils.py``) without
torchvision (grids are hand-tiled with the same geometry as
``torchvision.utils.make_grid``) and without the ffmpeg binary (GIF export is
native PIL; mp4 export is attempted via imageio and degrades to GIF with a
warning when no ffmpeg backend exists).

All functions take uint8 NHWC numpy arrays (the samplers' output format).
"""

from __future__ import annotations

import logging
import math
import os

import numpy as np

logger = logging.getLogger(__name__)


def _ensure_dir(path: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)


def _to_pil(img: np.ndarray):
    from PIL import Image

    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[:, :, 0]
    return Image.fromarray(img)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """Tile an (N, H, W, C) uint8 batch into one image — torchvision
    ``make_grid`` geometry (used by the reference's per-epoch sample dump,
    ``modules/utils.py:36-40``)."""
    n, h, w, c = images.shape
    ncols = min(nrow, n)
    nrows = math.ceil(n / ncols)
    grid = np.full(
        (padding + nrows * (h + padding), padding + ncols * (w + padding), c),
        pad_value, dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncols)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """Grid + save — the *intended* behavior of the reference's per-epoch
    ``save_images`` call (``modules/ddpm_utils.py:516-517``)."""
    _ensure_dir(path)
    _to_pil(make_grid(images, nrow)).save(path)


def save_gen_images(path_dir: str, data: np.ndarray, fileno) -> None:
    """Save a uint8 batch as ``image_{fileno[i]}.png`` files
    (``modules/utils.py:175-198`` contract, used for FID image sets)."""
    os.makedirs(path_dir, exist_ok=True)
    for i in range(data.shape[0]):
        _to_pil(data[i]).save(os.path.join(path_dir, f"image_{fileno[i]}.png"))


def save_dataset_images(path_dir: str, images_pm1: np.ndarray) -> None:
    """Export a [-1,1] float NHWC dataset as PNGs (reference
    ``save_dataset_MNIST`` / ``save_dataset_MNIST_CSV2PNG``,
    ``modules/utils.py:108-172`` — the FID reference set)."""
    x = np.clip((images_pm1 + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
    save_gen_images(path_dir, x, np.arange(x.shape[0]))


def make_collage(
    filedir: str,
    savedir: str,
    images_per_collage: int,
    total_image: int,
    image_size: int,
) -> list[str]:
    """Tile ``image_{i}.png`` files into √n x √n collages
    (``modules/utils.py:208-234``: column-major paste order preserved)."""
    from PIL import Image

    per_dim_total = int(math.isqrt(images_per_collage))
    per_dim = image_size * per_dim_total
    written = []
    for start_no in range(0, total_image, images_per_collage):
        files = [
            os.path.join(filedir, f"image_{i}.png")
            for i in range(start_no, start_no + images_per_collage)
        ]
        imgs = [Image.open(f).resize((image_size, image_size)) for f in files]
        collage = Image.new("RGB", (per_dim, per_dim))
        for i in range(per_dim_total):
            for j in range(per_dim_total):
                collage.paste(imgs[i * per_dim_total + j], (i * image_size, j * image_size))
        out = f"{savedir}_collage_{start_no}.png"
        _ensure_dir(out)
        collage.save(out)
        written.append(out)
    return written


def _normalize_frames(frames: np.ndarray) -> list[np.ndarray]:
    """Global min-max → uint8 HWC frame list (``modules/ddpm_tasks.py:397-405``)."""
    f = frames.astype(np.float64)
    f = (f - f.min()) / max(f.max() - f.min(), 1e-12)
    f = (f * 255).astype(np.uint8)
    out = []
    for frame in f:
        if frame.shape[-1] == 1:
            frame = np.repeat(frame, 3, axis=-1)
        out.append(frame)
    return out


def make_video(frames: np.ndarray, vname: str, fps: int = 1) -> str:
    """Write an mp4 (imageio) or, lacking an ffmpeg backend, a GIF.

    ``frames`` is (T, H, W, C) uint8/float NHWC (the samplers' trajectory
    output; the reference's CHW transpose is a torch-ism we don't need).
    """
    frames_u8 = _normalize_frames(np.asarray(frames))
    try:
        import imageio

        path = f"{vname}.mp4"
        _ensure_dir(path)
        imageio.mimsave(path, frames_u8, fps=fps, format="mp4")
        return path
    except Exception as e:  # no ffmpeg backend in this environment
        logger.warning("mp4 export unavailable (%s); writing GIF instead", e)
        return save_gif_frames(frames_u8, vname, fps)


def save_gif_frames(frames_u8: list[np.ndarray], filename: str, fps: int = 1,
                    scale: int | None = None) -> str:
    """Native-PIL GIF export — replaces the reference's ffmpeg subprocess
    (``modules/utils.py:236-244``; no ffmpeg binary is required here)."""
    from PIL import Image

    imgs = [_to_pil(f) for f in frames_u8]
    if scale:
        imgs = [im.resize((scale, int(im.height * scale / im.width)),
                          Image.Resampling.LANCZOS) for im in imgs]
    path = f"{filename}.gif"
    _ensure_dir(path)
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=max(int(1000 / fps), 20), loop=0,
    )
    return path


def save_gif(filename: str, fps: int, scale: int) -> str:
    """Reference-API shim: convert ``{filename}.mp4`` frames to GIF.

    The reference shells out to ffmpeg; here we re-read the mp4 with imageio
    when possible, else expect ``make_video`` to have already produced a GIF.
    """
    mp4 = f"{filename}.mp4"
    if os.path.exists(mp4):
        import imageio

        frames = [np.asarray(f) for f in imageio.mimread(mp4, memtest=False)]
        return save_gif_frames(frames, filename, fps, scale)
    gif = f"{filename}.gif"
    if os.path.exists(gif):
        return gif
    raise FileNotFoundError(mp4)
