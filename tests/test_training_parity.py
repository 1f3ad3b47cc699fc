"""Training-dynamics parity vs the torch reference.

Forward parity (test_reference_parity.py) proves the models compute the same
function; this module proves the *training step* matches: with identical
weights, batch, timesteps and noise, the MSE-on-ε loss, its gradients, and
the AdamW update must agree between torch (reference stack:
``modules/ddpm_utils.py:489-507``) and this framework — i.e. both frameworks
walk the same optimization trajectory.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet
from aliasfree_diffusion_models_pytorch_tpu.train import make_optimizer
from aliasfree_diffusion_models_pytorch_tpu.utils.torch_compat import torch_to_flax

from _reference_oracle import load_reference_modules, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

SIZE = 16
F_DICT = {"kernel_size": 3, "kaiser_beta": 2.0,
          "omega_c_down": math.pi / 2, "omega_c_up": math.pi / 2}


@pytest.mark.parametrize("variant", [0, 3])
@pytest.mark.slow
def test_one_adamw_step_matches_torch(variant):
    ref_models = load_reference_modules()
    torch.manual_seed(0)
    ref = ref_models.UNet(c_in=1, c_out=1, image_size=SIZE, device="cpu",
                          f_settings=None if variant == 0 else F_DICT,
                          variant=variant)
    ref.train()
    params = torch_to_flax(ref.state_dict())
    ours = UNet(c_in=1, c_out=1, image_size=SIZE, variant=variant,
                filters=None if variant == 0 else FilterSettings())

    rng = np.random.default_rng(3)
    # Identical training inputs injected into both frameworks: the schedule
    # math (noising) is already covered elsewhere, so feed x_t directly.
    x_t = rng.standard_normal((4, 1, SIZE, SIZE)).astype(np.float32)
    t = np.array([1, 250, 500, 999], dtype=np.int64)
    noise = rng.standard_normal((4, 1, SIZE, SIZE)).astype(np.float32)

    # --- torch: loss, backward, AdamW(3e-4) step (reference defaults) ---
    opt = torch.optim.AdamW(ref.parameters(), lr=3e-4)
    pred = ref(torch.from_numpy(x_t), torch.from_numpy(t))
    loss_t = torch.nn.functional.mse_loss(torch.from_numpy(noise), pred)
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    # --- ours: identical math with optax ---
    def loss_fn(p):
        pr = ours.apply(p, jnp.asarray(np.transpose(x_t, (0, 2, 3, 1))),
                        jnp.asarray(t))
        return jnp.mean((jnp.asarray(np.transpose(noise, (0, 2, 3, 1))) - pr) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)

    # Gradient parity: collect torch grads through the same name mapping.
    torch_grads = torch_to_flax(
        {name: p.grad for name, p in ref.named_parameters()}
    )
    g_ours = jax.tree.leaves(grads)
    g_ref = jax.tree.leaves(torch_grads)
    assert len(g_ours) == len(g_ref)
    for a, b in zip(g_ours, g_ref):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, rtol=1e-3)

    # AdamW-step parity, restricted to coordinates with non-noise gradients:
    # at step 1 Adam's update is ±lr·sign(g) for every coordinate, so
    # fp32-noise-level gradients (|g| ≲ 1e-6) legitimately flip sign between
    # frameworks — excluded by the mask.
    tx = make_optimizer(3e-4)
    updates, _ = tx.update(grads, tx.init(params), params)
    new_params = optax.apply_updates(params, updates)
    updated_ref = torch_to_flax(ref.state_dict())
    checked = total = 0
    for a, b, g in zip(jax.tree.leaves(new_params), jax.tree.leaves(updated_ref),
                       g_ref):
        mask = np.abs(np.asarray(g)) > 1e-5
        total += mask.size
        checked += int(mask.sum())
        if mask.any():
            np.testing.assert_allclose(
                np.asarray(a)[mask], np.asarray(b)[mask], atol=3e-6
            )
    assert checked > total * 0.5  # the mask must cover most coordinates
