"""InceptionV3 feature extractor (flax) for published-comparable FID/IS/KID.

The reference evaluates with ``torch-fidelity`` (``Perf_evaluation.ipynb``),
which uses the "FID Inception" network — the TF-Slim InceptionV3 port that
Heusel et al.'s original FID implementation used, structurally torchvision's
``inception_v3`` with three documented quirks (mirrored from the public
pytorch-fid/torch-fidelity descriptions):

* every in-block average pool uses ``count_include_pad=False``;
* the last Inception-E block pools with MAX instead of AVG;
* the classifier has 1008 outputs (TF legacy classes).

This module implements that architecture in flax (NHWC) and loads the
standard ``pt_inception-2015-12-05`` / torchvision-style state dict from a
local file (this environment has no network egress; point ``weights_path`` at
a cached copy — torchvision layer names are used verbatim so conversion is
mechanical). Output: 2048-d pool3 features (FID/KID) and 1008-way softmax
(IS).

Inputs follow the pytorch-fid protocol: uint8 [0,255] → /255 → bilinear
resize to 299x299 (align_corners=False) → scale to [-1, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Functional layers operating on a params dict {name: {weight arrays}}
# ---------------------------------------------------------------------------


def _conv_bn(params: dict, name: str, x, stride=1, padding=0):
    """BasicConv2d: conv(bias=False) → BN(eps=1e-3, inference) → relu."""
    p = params[name]
    w = p["conv.weight"]  # HWIO
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x = lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = p["bn.weight"] / jnp.sqrt(p["bn.running_var"] + 1e-3)
    x = x * scale + (p["bn.bias"] - p["bn.running_mean"] * scale)
    return jax.nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """3x3/s1/p1 average pool with count_include_pad=False (FID quirk)."""
    ones = jnp.ones_like(x[..., :1])
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def _max_pool(x, k, s, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


def _inception_a(params, prefix, x, pool_features):
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x)
    b5 = _conv_bn(params, f"{prefix}.branch5x5_1", x)
    b5 = _conv_bn(params, f"{prefix}.branch5x5_2", b5, padding=2)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_2", b3, padding=1)
    b3 = _conv_bn(params, f"{prefix}.branch3x3dbl_3", b3, padding=1)
    bp = _avg_pool_3x3_no_pad_count(x)
    bp = _conv_bn(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, prefix, x):
    b3 = _conv_bn(params, f"{prefix}.branch3x3", x, stride=2)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_2", bd, padding=1)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_3", bd, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(params, prefix, x):
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x)
    b7 = _conv_bn(params, f"{prefix}.branch7x7_1", x)
    b7 = _conv_bn(params, f"{prefix}.branch7x7_2", b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(params, f"{prefix}.branch7x7_3", b7, padding=((3, 3), (0, 0)))
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_1", x)
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_2", bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_3", bd, padding=((0, 0), (3, 3)))
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_4", bd, padding=((3, 3), (0, 0)))
    bd = _conv_bn(params, f"{prefix}.branch7x7dbl_5", bd, padding=((0, 0), (3, 3)))
    bp = _avg_pool_3x3_no_pad_count(x)
    bp = _conv_bn(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, prefix, x):
    b3 = _conv_bn(params, f"{prefix}.branch3x3_1", x)
    b3 = _conv_bn(params, f"{prefix}.branch3x3_2", b3, stride=2)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_1", x)
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_2", b7, padding=((0, 0), (3, 3)))
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_3", b7, padding=((3, 3), (0, 0)))
    b7 = _conv_bn(params, f"{prefix}.branch7x7x3_4", b7, stride=2)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(params, prefix, x, pool: str):
    b1 = _conv_bn(params, f"{prefix}.branch1x1", x)
    b3 = _conv_bn(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [
            _conv_bn(params, f"{prefix}.branch3x3_2a", b3, padding=((0, 0), (1, 1))),
            _conv_bn(params, f"{prefix}.branch3x3_2b", b3, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv_bn(params, f"{prefix}.branch3x3dbl_2", bd, padding=1)
    bd = jnp.concatenate(
        [
            _conv_bn(params, f"{prefix}.branch3x3dbl_3a", bd, padding=((0, 0), (1, 1))),
            _conv_bn(params, f"{prefix}.branch3x3dbl_3b", bd, padding=((1, 1), (0, 0))),
        ],
        axis=-1,
    )
    if pool == "max":  # FID-Inception quirk in the final block
        bp = _max_pool(x, 3, 1, pad=1)
    else:
        bp = _avg_pool_3x3_no_pad_count(x)
    bp = _conv_bn(params, f"{prefix}.branch_pool", bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_forward(params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x: (N, 299, 299, 3) in [-1, 1] → (features (N, 2048), logits (N, C))."""
    x = _conv_bn(params, "Conv2d_1a_3x3", x, stride=2)
    x = _conv_bn(params, "Conv2d_2a_3x3", x)
    x = _conv_bn(params, "Conv2d_2b_3x3", x, padding=1)
    x = _max_pool(x, 3, 2)
    x = _conv_bn(params, "Conv2d_3b_1x1", x)
    x = _conv_bn(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x, 3, 2)
    x = _inception_a(params, "Mixed_5b", x, 32)
    x = _inception_a(params, "Mixed_5c", x, 64)
    x = _inception_a(params, "Mixed_5d", x, 64)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_c(params, "Mixed_6e", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    feats = jnp.mean(x, axis=(1, 2))  # global average pool → (N, 2048)
    logits = feats @ params["fc"]["weight"].T + params["fc"]["bias"]
    return feats, logits


def convert_torch_state_dict(sd: dict) -> dict:
    """torchvision/pt_inception state dict → the nested numpy dict used here.

    Conv weights transpose OIHW→HWIO; BN/fc tensors pass through. Aux
    classifier tensors (``AuxLogits.*``) are dropped.
    """
    out: dict[str, Any] = {}
    for key, raw in sd.items():
        if key.startswith("AuxLogits"):
            continue
        v = raw.detach().cpu().numpy() if hasattr(raw, "detach") else np.asarray(raw)
        if key.startswith("fc."):
            out.setdefault("fc", {})[key[3:]] = v
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight → ["Mixed_5b.branch1x1"]["conv.weight"]
        parts = key.split(".")
        mod, leaf = ".".join(parts[:-2]), ".".join(parts[-2:])
        if leaf == "conv.weight":
            v = v.transpose(2, 3, 1, 0)
        if leaf.startswith("bn.num_batches"):
            continue
        out.setdefault(mod, {})[leaf] = v
    return out


@dataclasses.dataclass
class InceptionV3Flax:
    """FeatureExtractor-protocol implementation backed by local weights.

    ``weights_path`` may be a torch ``.pt``/``.pth`` state dict (requires
    torch to read) or an ``.npz`` produced by :func:`save_npz`.
    """

    weights_path: str
    batch_size: int = 64
    name: str = "inception-v3-fid"

    def __post_init__(self):
        import os

        if not os.path.exists(self.weights_path):
            raise FileNotFoundError(
                f"InceptionV3 weights not found at {self.weights_path!r}; "
                "cache torchvision inception_v3 / pt_inception weights locally "
                "(no network egress in this environment)."
            )
        if self.weights_path.endswith(".npz"):
            with np.load(self.weights_path) as z:
                flat = {k: z[k] for k in z.files}
            params: dict = {}
            for k, v in flat.items():
                mod, leaf = k.split("|")
                params.setdefault(mod, {})[leaf] = v
            self.params = params
        else:
            import torch

            sd = torch.load(self.weights_path, map_location="cpu", weights_only=True)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            self.params = convert_torch_state_dict(sd)
        self._forward = jax.jit(lambda p, x: inception_forward(p, x))

    def save_npz(self, path: str) -> None:
        flat = {
            f"{mod}|{leaf}": v
            for mod, leaves in self.params.items()
            for leaf, v in leaves.items()
        }
        np.savez(path, **flat)

    def _preprocess(self, images_u8: np.ndarray) -> np.ndarray:
        from aliasfree_diffusion_models_pytorch_tpu.data import resize_bilinear_np

        x = images_u8.astype(np.float32) / 255.0
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        x = resize_bilinear_np(x, 299)
        return (x - 0.5) * 2.0

    def _run(self, images_u8: np.ndarray):
        feats, probs = [], []
        for i in range(0, len(images_u8), self.batch_size):
            x = jnp.asarray(self._preprocess(images_u8[i : i + self.batch_size]))
            f, l = self._forward(self.params, x)
            feats.append(np.asarray(f))
            probs.append(np.asarray(jax.nn.softmax(l, axis=-1)))
        return np.concatenate(feats), np.concatenate(probs)

    def features(self, images_u8: np.ndarray) -> np.ndarray:
        return self._run(images_u8)[0]

    def logits(self, images_u8: np.ndarray) -> np.ndarray:
        return self._run(images_u8)[1]
