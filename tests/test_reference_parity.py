"""End-to-end numerical parity against the actual reference torch UNet.

The strongest parity evidence in the suite: build the reference model, import
its weights through ``utils/torch_compat.py``, and require the JAX forward
pass to match the torch forward pass on identical inputs, per variant.

Skipped when the reference checkout is absent (end-user installs).
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet, param_count
from aliasfree_diffusion_models_pytorch_tpu.utils.torch_compat import torch_to_flax

from _reference_oracle import load_reference_modules, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

F_DICT = {
    "kernel_size": 3,
    "kaiser_beta": 2.0,
    "omega_c_down": math.pi / 2,
    "omega_c_up": math.pi / 2,
}
F_SETTINGS = FilterSettings(
    kernel_size=3, kaiser_beta=2.0, omega_c_down=math.pi / 2, omega_c_up=math.pi / 2
)
SIZE = 16  # divisible by 8; small enough for 1-core CPU compiles


def _build_pair(variant: int, num_classes=None):
    ref_models = load_reference_modules()
    torch.manual_seed(0)
    f = None if variant == 0 else F_DICT
    ref = ref_models.UNet(
        c_in=1, c_out=1, image_size=SIZE, device="cpu", f_settings=f,
        num_classes=num_classes, variant=variant,
    )
    ref.eval()
    ours = UNet(
        c_in=1, c_out=1, image_size=SIZE,
        filters=None if variant == 0 else F_SETTINGS,
        num_classes=num_classes, variant=variant,
    )
    params = torch_to_flax(ref.state_dict())
    return ref, ours, params


@pytest.mark.parametrize("variant", [0, 1, 2, 3, 4])
def test_forward_parity(variant):
    ref, ours, params = _build_pair(variant)
    rng = np.random.default_rng(variant)
    x = rng.standard_normal((2, 1, SIZE, SIZE)).astype(np.float32)
    t = np.array([500, 3], dtype=np.int64)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = ours.apply(params, x_nhwc, jnp.asarray(t))
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))

    np.testing.assert_allclose(out_nchw, ref_out, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_param_count_parity(variant):
    ref, ours, params = _build_pair(variant)
    ref_n = sum(p.numel() for p in ref.parameters())
    assert param_count(params) == ref_n
    # And our own init produces the identical tree structure/shapes.
    init_params = ours.init_params(jax.random.key(0), batch=1)
    ref_tree = jax.tree.structure(params)
    init_tree = jax.tree.structure(init_params)
    assert ref_tree == init_tree
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(init_params)):
        assert a.shape == b.shape


def test_param_count_variant4_dead_norms():
    """Variant 4: reference carries dead stage-level GroupNorms
    (modules/ddpm_utils.py:440-445,471-476) that we drop on import."""
    ref, ours, params = _build_pair(4)
    ref_n = sum(p.numel() for p in ref.parameters())
    dead = sum(
        p.numel()
        for name, p in ref.named_parameters()
        if name.split(".")[1:2] == ["norm1"] and name.split(".")[0][:-1] in ("down", "up")
    )
    assert dead > 0
    assert param_count(params) == ref_n - dead


def test_conditional_forward_parity():
    ref, ours, params = _build_pair(0, num_classes=10)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, SIZE, SIZE)).astype(np.float32)
    t = np.array([10, 999], dtype=np.int64)
    y = np.array([3, 7], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)).numpy()
    out = ours.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(t), jnp.asarray(y)
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref_out, atol=5e-4, rtol=1e-3
    )


@pytest.mark.parametrize("variant", [0, 3, 4])
def test_flax_to_torch_roundtrip(variant):
    """Export back to a reference state_dict: loads strict=True and
    round-trips numerically."""
    from aliasfree_diffusion_models_pytorch_tpu.utils.torch_compat import (
        flax_to_torch,
    )

    ref, ours, params = _build_pair(variant)
    exported = flax_to_torch(params, variant)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()}
    ref.load_state_dict(sd, strict=True)
    # Re-import and compare with the original import.
    back = torch_to_flax(ref.state_dict())
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
