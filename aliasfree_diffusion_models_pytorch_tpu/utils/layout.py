"""NCHW ↔ NHWC layout helpers.

The framework is NHWC-internal (TPU-native: channels ride the 128-lane
dimension). The reference and its checkpoints/datasets are NCHW torch; these
helpers live at the IO edge only.
"""

from __future__ import annotations

import numpy as np


def nchw_to_nhwc(x):
    """(N, C, H, W) → (N, H, W, C); works on numpy or jax arrays."""
    return x.transpose(0, 2, 3, 1) if isinstance(x, np.ndarray) else x.transpose((0, 2, 3, 1))


def nhwc_to_nchw(x):
    """(N, H, W, C) → (N, C, H, W); works on numpy or jax arrays."""
    return x.transpose(0, 3, 1, 2) if isinstance(x, np.ndarray) else x.transpose((0, 3, 1, 2))
