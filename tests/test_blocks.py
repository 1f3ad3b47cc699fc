"""Block-level parity tests against reference torch modules (weight transfer).

Each block gets the reference implementation's weights imported through
``utils/torch_compat.py`` and must reproduce the torch forward output to
float32 precision. Skipped without the reference checkout.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
from aliasfree_diffusion_models_pytorch_tpu.models import blocks as B
from aliasfree_diffusion_models_pytorch_tpu.models.unet import (
    sinusoidal_time_embedding,
)
from aliasfree_diffusion_models_pytorch_tpu.utils.torch_compat import torch_to_flax

from _reference_oracle import load_reference_modules, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

F_DICT = {
    "kernel_size": 3,
    "kaiser_beta": 2.0,
    "omega_c_down": np.pi / 2,
    "omega_c_up": np.pi / 2,
}
F_SET = FilterSettings()
RNG = np.random.default_rng(0)
ATOL = 1e-5


def _ref_utils():
    load_reference_modules()
    import modules.ddpm_utils as ref_utils

    return ref_utils


def _to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _params_for(prefix, torch_module):
    full = torch_to_flax(
        {f"{prefix}.{k}": v for k, v in torch_module.state_dict().items()}
    )
    return {"params": full["params"][prefix]}


def test_time_embedding_matches_torch():
    t = torch.tensor([999, 500, 3, 1]).unsqueeze(-1).float()
    inv = 1.0 / (10000 ** (torch.arange(0, 256, 2).float() / 256))
    ref = torch.cat(
        [torch.sin(t.repeat(1, 128) * inv), torch.cos(t.repeat(1, 128) * inv)], dim=-1
    ).numpy()
    ours = np.asarray(sinusoidal_time_embedding(jnp.array([999, 500, 3, 1]), 256))
    # 2e-4: torch's fp32 pow rounds some inv_freq values 1 ulp differently
    # than the correctly-rounded float64 path; at t=999 that amplifies into
    # the angle (see _time_embedding_table docstring).
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_selfattention_matches_torch():
    ref_utils = _ref_utils()
    torch.manual_seed(1)
    sa = ref_utils.SelfAttention(32, 8)
    sa.eval()
    x = RNG.standard_normal((2, 32, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = sa(torch.from_numpy(x)).numpy()
    got = B.SelfAttention(32).apply(_params_for("sa1", sa), _to_nhwc(x))
    np.testing.assert_allclose(_from_nhwc(got), want, atol=ATOL)


@pytest.mark.parametrize("residual", [False, True])
def test_doubleconv_matches_torch(residual):
    ref_utils = _ref_utils()
    torch.manual_seed(2)
    dc = ref_utils.DoubleConv(16, 16, residual=residual)
    dc.eval()
    x = RNG.standard_normal((2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = dc(torch.from_numpy(x)).numpy()
    got = B.DoubleConv(16, residual=residual).apply(_params_for("inc", dc), _to_nhwc(x))
    np.testing.assert_allclose(_from_nhwc(got), want, atol=ATOL)


@pytest.mark.parametrize("mode,cls", [("filtered", "DoubleConv_F"),
                                      ("filtered4", "DoubleConv_F4")])
@pytest.mark.parametrize("residual", [False, True])
def test_filtered_doubleconv_matches_torch(mode, cls, residual):
    ref_utils = _ref_utils()
    torch.manual_seed(3)
    dc = getattr(ref_utils, cls)(16, 16, residual=residual, f_settings=F_DICT)
    dc.eval()
    x = RNG.standard_normal((2, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = dc(torch.from_numpy(x)).numpy()
    got = B.DoubleConv(16, residual=residual, conv_mode=mode, filters=F_SET).apply(
        _params_for("inc", dc), _to_nhwc(x)
    )
    np.testing.assert_allclose(_from_nhwc(got), want, atol=ATOL)


@pytest.mark.parametrize(
    "cls,resample,conv_mode",
    [
        ("Down", "maxpool", "plain"),
        ("Down_F", "maxpool", "filtered"),
        ("Down_FF", "aliasfree", "plain"),
        ("Down_FFF", "aliasfree", "filtered"),
        ("Down_F4", "aliasfree", "filtered4"),
    ],
)
def test_down_matches_torch(cls, resample, conv_mode):
    ref_utils = _ref_utils()
    torch.manual_seed(4)
    kwargs = {} if cls == "Down" else {"f_settings": F_DICT}
    d = getattr(ref_utils, cls)(16, 32, **kwargs)
    d.eval()
    x = RNG.standard_normal((2, 16, 8, 8)).astype(np.float32)
    temb = RNG.standard_normal((2, 256)).astype(np.float32)
    with torch.no_grad():
        want = d(torch.from_numpy(x), torch.from_numpy(temb)).numpy()
    got = B.Down(
        32, resample=resample, conv_mode=conv_mode,
        filters=None if cls == "Down" else F_SET,
    ).apply(_params_for("down1", d), _to_nhwc(x), jnp.asarray(temb))
    np.testing.assert_allclose(_from_nhwc(got), want, atol=ATOL)


@pytest.mark.parametrize(
    "cls,resample,conv_mode",
    [
        ("Up", "bilinear", "plain"),
        ("Up_F", "bilinear", "filtered"),
        ("Up_FF", "aliasfree", "plain"),
        ("Up_FFF", "aliasfree", "filtered"),
        ("Up_F4", "aliasfree", "filtered4"),
    ],
)
def test_up_matches_torch(cls, resample, conv_mode):
    ref_utils = _ref_utils()
    torch.manual_seed(5)
    kwargs = {} if cls == "Up" else {"f_settings": F_DICT}
    u = getattr(ref_utils, cls)(48, 16, **kwargs)
    u.eval()
    x = RNG.standard_normal((2, 16, 4, 4)).astype(np.float32)
    skip = RNG.standard_normal((2, 32, 8, 8)).astype(np.float32)
    temb = RNG.standard_normal((2, 256)).astype(np.float32)
    with torch.no_grad():
        want = u(
            torch.from_numpy(x), torch.from_numpy(skip), torch.from_numpy(temb)
        ).numpy()
    got = B.Up(
        16, resample=resample, conv_mode=conv_mode,
        filters=None if cls == "Up" else F_SET,
    ).apply(_params_for("up1", u), _to_nhwc(x), _to_nhwc(skip), jnp.asarray(temb))
    np.testing.assert_allclose(_from_nhwc(got), want, atol=ATOL)
