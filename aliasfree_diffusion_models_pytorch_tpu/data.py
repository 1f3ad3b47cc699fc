"""Data pipelines: MNIST-CSV, image-folder trees, synthetic fallback.

Rebuild of the reference loaders (``modules/utils.py:43-82``):

* :func:`load_mnist_csv` — the reference's ``get_data_MNIST``: CSV with
  label in column 0 and 784 pixel columns, ``/255`` → bilinear 28→32 resize
  (torchvision tensor-mode ``Resize(32)``; upscaling, so antialias is a
  no-op) → ``Normalize((0.5,), (0.5,))`` → [-1, 1]. Whole dataset
  materialized in memory, as in the reference.
* :func:`load_image_folder` — the reference's ``get_data`` /
  ``torchvision.datasets.ImageFolder``: class-per-subdirectory image tree,
  shorter-edge resize to ``image_size``, ``ToTensor`` + ``Normalize`` →
  [-1, 1]. Used for CIFAR-10-32 / MNIST-M PNG trees (square images, so the
  resize is usually an identity).
* :class:`Dataloader` — deterministic shuffling + batch gather through the
  native C++ loader when built (NumPy fallback), NHWC float32 batches. ``drop_last=False`` matches the torch
  ``DataLoader`` default; the multi-chip path uses ``drop_last=True`` so
  every step has a static, mesh-divisible shape (one XLA executable).

The resize is implemented as a constant linear operator
(``ops/resample.py:resize_matrix_1d``) applied with two matmuls — the same
TPU-native trick the model uses for bilinear upsampling.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Iterator

import numpy as np

from aliasfree_diffusion_models_pytorch_tpu.ops.resample import resize_matrix_1d

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


@dataclasses.dataclass
class ArrayDataset:
    """In-memory dataset: images NHWC float32 in [-1, 1], integer labels."""

    images: np.ndarray
    labels: np.ndarray

    def __post_init__(self):
        assert self.images.ndim == 4, self.images.shape
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)


def resize_bilinear_np(x: np.ndarray, out_size: int) -> np.ndarray:
    """Bilinear resize of an NHWC batch via separable constant matrices
    (align_corners=False — the torch ``F.interpolate`` convention used by
    torchvision ``Resize`` on tensors)."""
    _, h, w, _ = x.shape
    if h == out_size and w == out_size:
        return x
    mh = resize_matrix_1d(h, out_size, align_corners=False, dtype=np.float32)
    mw = resize_matrix_1d(w, out_size, align_corners=False, dtype=np.float32)
    x = np.einsum("oh,nhwc->nowc", mh, x)
    return np.einsum("pw,nhwc->nhpc", mw, x)


def load_mnist_csv(path: str, image_size: int = 32) -> ArrayDataset:
    """MNIST-from-CSV (``modules/utils.py:55-82`` behavior).

    Parsing goes through the native C++ runtime when built
    (``native/csv_loader.cpp``; ~10x pandas) and falls back to pandas
    otherwise — identical output either way (tested).
    """
    from aliasfree_diffusion_models_pytorch_tpu.utils.native import (
        parse_label_pixel_csv,
    )

    native = parse_label_pixel_csv(path, cols=784)
    if native is not None:
        labels, feats = native
        feats = feats.reshape(-1, 28, 28, 1)
    else:
        import pandas as pd

        data = pd.read_csv(path)
        labels = data.iloc[:, 0].to_numpy().astype(np.int32)
        feats = (data.iloc[:, 1:].to_numpy().astype(np.float32) / 255.0).reshape(
            -1, 28, 28, 1
        )
    feats = resize_bilinear_np(feats, image_size)
    feats = (feats - 0.5) / 0.5
    return ArrayDataset(feats, labels)


def load_image_folder(root: str, image_size: int = 32) -> ArrayDataset:
    """ImageFolder tree → in-memory NHWC array dataset.

    Matches ``get_data`` (``modules/utils.py:43-52``): shorter-edge resize,
    /255, normalize each channel with (0.5, 0.5). Grayscale images keep one
    channel; everything else converts to RGB.
    """
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {root}")
    images, labels = [], []
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith(IMAGE_EXTENSIONS):
                continue
            img = Image.open(os.path.join(cdir, fname))
            img = img.convert("L") if img.mode in ("L", "1", "I;16") else img.convert("RGB")
            w, h = img.size
            if min(w, h) != image_size:
                scale = image_size / min(w, h)
                img = img.resize(
                    (round(w * scale), round(h * scale)), Image.Resampling.BILINEAR
                )
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            images.append(arr)
            labels.append(ci)
    x = np.stack(images)
    x = (x - 0.5) / 0.5
    return ArrayDataset(x, np.asarray(labels, np.int32))


def synthetic_dataset(
    n: int = 512, image_size: int = 32, channels: int = 1, seed: int = 0
) -> ArrayDataset:
    """Procedural stand-in (smooth random blobs in [-1, 1]) for tests/benches
    when no real dataset is mounted.

    The class label DETERMINES the pattern's frequency band (class k →
    frequencies ≈ 0.5 + 0.28·k, small jitter), so classes are visually
    distinct and a conditional model can genuinely learn the mapping —
    which makes class-conditional training / CFG demos measurable (the
    dominant FFT frequency of a generated sample reveals its class; see
    ``benchmarks/cfg_demo.py``).
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n).astype(np.int32)
    freq = (
        0.5
        + 0.28 * labels[:, None, None]
        + rng.uniform(0.0, 0.2, (n, 2, channels))
    )
    phase = rng.uniform(0, 2 * np.pi, (n, 2, channels))
    yy, xx = np.mgrid[0:image_size, 0:image_size] / image_size * 2 * np.pi
    img = np.sin(freq[:, 0, None, None, :] * yy[None, :, :, None] + phase[:, 0, None, None, :]) \
        * np.sin(freq[:, 1, None, None, :] * xx[None, :, :, None] + phase[:, 1, None, None, :])
    return ArrayDataset(img.astype(np.float32), labels)


class Dataloader:
    """Deterministic shuffling batch iterator over an :class:`ArrayDataset`.

    ``seed`` + ``epoch`` fully determine the order (reference determinism
    contract, ``modules/utils.py:98-105``, without global RNG state).

    The per-epoch permutation and the per-batch gather run through the native
    C++ loader (``native/csv_loader.cpp``) when its library is available —
    the host-pipeline fast path — with a NumPy fallback that reimplements the
    same splitmix64 Fisher-Yates (:func:`splitmix64_permutation`), so the
    shuffle order AND the gathered batches are bit-identical across paths:
    "same seed" reproduces the same run whether or not the .so is built (a
    one-time log notes which path is active).
    """

    def __init__(
        self,
        dataset: ArrayDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        from aliasfree_diffusion_models_pytorch_tpu.utils import native

        n = len(self.dataset)
        if self.shuffle:
            order = native.shuffled_permutation(n, self.seed, self.epoch)
            if order is None:
                _log_numpy_fallback_once()
                order = splitmix64_permutation(n, self.seed, self.epoch)
        else:
            order = np.arange(n)
        self.epoch += 1
        stop = n - n % self.batch_size if self.drop_last else n
        images = self.dataset.images
        use_native_gather = (
            images.dtype == np.float32 and images.flags["C_CONTIGUOUS"]
        )
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            batch = (
                native.gather_batch(images, order, start, len(idx))
                if use_native_gather
                else None
            )
            if batch is None:
                batch = images[idx]
            yield batch, self.dataset.labels[idx]


_NUMPY_FALLBACK_LOGGED = False


def _log_numpy_fallback_once() -> None:
    global _NUMPY_FALLBACK_LOGGED
    if not _NUMPY_FALLBACK_LOGGED:
        _NUMPY_FALLBACK_LOGGED = True
        logging.getLogger(__name__).info(
            "native loader unavailable; using the NumPy shuffle fallback "
            "(splitmix64 Fisher-Yates — same order as the native path)"
        )


_SM64_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_SM64_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_MIX2 = np.uint64(0x94D049BB133111EB)
_SM64_EPOCH_OFF = np.uint64(0xD1B54A32D192ED03)


def splitmix64_permutation(n: int, seed: int, epoch: int) -> np.ndarray:
    """splitmix64 Fisher-Yates permutation — bit-identical to the native path.

    One deterministic shuffle contract regardless of whether the C++ loader
    is built: this mirrors ``afdm_shuffled_permutation``
    (``native/csv_loader.cpp``) exactly, so "same seed" reproduces the same
    data order on every install (the numbered-stream draws are vectorized;
    only the inherently-sequential swap loop runs in Python).

    Cost note: the swap loop is interpreted Python, O(n) per epoch — ~40 ms
    per million rows. Negligible at MNIST/CIFAR scale; for multi-million-row
    datasets build the C++ loader (``make -C native``), which is the fast
    path for exactly this reason.
    """
    out = np.arange(n, dtype=np.int64)
    if n <= 1:
        return out
    with np.errstate(over="ignore"):
        s0 = np.uint64(seed) * _SM64_GOLDEN + np.uint64(epoch) + _SM64_EPOCH_OFF
        # Draw k for swap index i = n-1-k uses stream state s0 + (k+1)*GOLDEN.
        z = s0 + np.arange(1, n, dtype=np.uint64) * _SM64_GOLDEN
        z = (z ^ (z >> np.uint64(30))) * _SM64_MIX1
        z = (z ^ (z >> np.uint64(27))) * _SM64_MIX2
        z ^= z >> np.uint64(31)
    ladder = np.arange(n, 1, -1, dtype=np.uint64)  # i+1 for i = n-1 .. 1
    js = (z % ladder).astype(np.int64)
    for k in range(n - 1):
        i = n - 1 - k
        j = js[k]
        out[i], out[j] = out[j], out[i]
    return out


class PrefetchLoader:
    """Background-thread prefetch wrapper around any batch iterable.

    Overlaps host-side batch preparation (shuffling/gather/copy) with the
    device step — the host analogue of double buffering. Bounded queue keeps
    memory flat; depth 2 suffices because JAX dispatch is async.
    """

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def worker():
            # A loader exception must NOT degrade into a silent early
            # end-of-epoch: enqueue it and re-raise in the consumer.
            try:
                for item in self.loader:
                    q.put(item)
                q.put(sentinel)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
        t.join()


def get_data(
    dataset: str,
    dataset_path: str | None,
    image_size: int,
    batch_size: int,
    *,
    image_channels: int | None = None,
    seed: int = 0,
    drop_last: bool = False,
    synthetic_fallback: bool = False,
) -> tuple[Dataloader, ArrayDataset]:
    """Dispatcher mirroring ``ddpm_run``'s dataset selection
    (``modules/ddpm_tasks.py:286-289``): "MNIST" → CSV loader, anything else
    → image-folder loader. Returns ``(dataloader, dataset)``."""
    if dataset_path is None or (
        synthetic_fallback and not os.path.exists(dataset_path)
    ):
        channels = image_channels or (1 if dataset == "MNIST" else 3)
        ds = synthetic_dataset(image_size=image_size, seed=seed, channels=channels)
    elif dataset == "MNIST":
        ds = load_mnist_csv(dataset_path, image_size)
    else:
        ds = load_image_folder(dataset_path, image_size)
    dl = Dataloader(ds, batch_size, shuffle=True, drop_last=drop_last, seed=seed)
    return dl, ds
