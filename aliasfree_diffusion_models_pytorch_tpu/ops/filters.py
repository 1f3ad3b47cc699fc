"""Low-pass FIR filter design (pure NumPy, trace-time).

TPU-native equivalent of the reference's filter design module
(``modules/filtrs.py``). Filter taps are *design-time constants*: they depend
only on static config (kernel size, cutoff, Kaiser beta), so we compute them
once in float64 NumPy and bake them into the jitted XLA graph as literals —
unlike the reference, which rebuilds/moves them to device on every call
(``modules/filtrs.py:73,91``).

Numerics notes:
* ``circular_lowpass_kernel`` matches ``circularLowpassKernel``
  (``modules/filtrs.py:20-37``): a circularly-symmetric jinc
  ``omega_c * J1(omega_c * r) / (2*pi*r)`` with the odd-size center value
  ``omega_c**2 / (4*pi)``, an optional 2D Kaiser window (outer product of the
  1D window), and sum-to-one normalization. The reference *always* normalizes;
  we expose ``normalize`` so the README's non-normalized config family
  (``README.md:158-167``) is also expressible.
* ``jinc_filter_2d`` matches the visualization-only separable design
  (``modules/filtrs.py:11-18``): windowed 1D sinc outer product.
"""

from __future__ import annotations

import numpy as np
from scipy.special import j1

__all__ = [
    "circular_lowpass_kernel",
    "jinc_filter_2d",
    "kernel_frequency_response",
]


def circular_lowpass_kernel(
    omega_c: float = np.pi,
    size: int = 6,
    beta: float | None = None,
    normalize: bool = True,
    dtype=np.float32,
) -> np.ndarray:
    """Circularly-symmetric 2D low-pass ("jinc") kernel.

    Args:
      omega_c: cutoff frequency in radians (pi is Nyquist).
      size: kernel side length N (both horizontal and vertical).
      beta: optional Kaiser window shape parameter (None = no window).
      normalize: divide by the tap sum so DC gain is exactly 1.
      dtype: output dtype (design is always done in float64).

    Returns:
      ``(size, size)`` ndarray of FIR taps.
    """
    n = int(size)
    c = (n - 1) / 2.0
    x, y = np.meshgrid(np.arange(n, dtype=np.float64),
                       np.arange(n, dtype=np.float64), indexing="ij")
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        kernel = omega_c * j1(omega_c * r) / (2.0 * np.pi * r)
    if n % 2:
        # r == 0 at the center for odd sizes: analytic limit of the jinc.
        kernel[(n - 1) // 2, (n - 1) // 2] = omega_c**2 / (4.0 * np.pi)

    if beta is not None:
        w1d = np.kaiser(n, beta)
        kernel = kernel * np.outer(w1d, w1d)

    if normalize:
        kernel = kernel / np.sum(kernel)
    return kernel.astype(dtype)


def jinc_filter_2d(size: int = 6, beta: float = 14.0, dtype=np.float32) -> np.ndarray:
    """Separable windowed-sinc 2D kernel (diagnostics/visualization only).

    Outer product of (1D ``np.sinc`` over ``linspace(-size/2, size/2, size)``
    times a Kaiser window), normalized to unit sum — the design the reference
    plots alongside the production kernel in ``ddpm_run``
    (``modules/ddpm_tasks.py:131``).
    """
    grid = np.linspace(-size / 2.0, size / 2.0, size)
    sinc_1d = np.sinc(grid) * np.kaiser(size, beta)
    kernel = np.outer(sinc_1d, sinc_1d)
    kernel = kernel / np.sum(kernel)
    return kernel.astype(dtype)


def kernel_frequency_response(kernel: np.ndarray, n_fft: int = 64) -> np.ndarray:
    """|FFT| magnitude response on an ``n_fft x n_fft`` grid (fftshifted).

    Numeric core of the reference's ``plot_filter_and_response``
    (``modules/filtrs.py:39-68``), decoupled from matplotlib so it is
    testable; the plotting wrapper lives in ``utils/plotting.py``.
    """
    k = np.asarray(kernel, dtype=np.float64)
    padded = np.zeros((max(n_fft, k.shape[0]), max(n_fft, k.shape[1])))
    padded[: k.shape[0], : k.shape[1]] = k
    return np.abs(np.fft.fftshift(np.fft.fft2(padded)))
