"""Pallas flash-attention kernel vs the XLA reference (interpret mode on CPU).

The kernel is the TPU perf path for the SelfAttention blocks
(``ops/flash_attention.py``); these tests pin its numerics — forward and the
custom-vjp backward — against the plain einsum formulation at every shape the
UNet actually uses (S ∈ {256, 1024}, D ∈ {8, 16, 32}), plus the module-level
equivalence including the qkv projection and residual/FF tail.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from aliasfree_diffusion_models_pytorch_tpu.ops.flash_attention import (
    attention_reference,
    flash_mha,
)

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


def _qkv(b, h, s, d, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal((b, h, s, d)), dtype) for _ in range(3)
    )


@pytest.mark.parametrize(
    "b,h,s,d",
    [
        (2, 4, 256, 8),    # sa5-like
        (2, 4, 256, 16),   # sa1-like
        (1, 4, 1024, 8),   # sa6-like (q-blocked: 1024 = 2x512)
        (2, 2, 512, 16),   # g=4 grouped, single q-block
        (2, 2, 128, 32),
    ],
)
def test_forward_matches_reference(b, h, s, d):
    q, k, v = _qkv(b, h, s, d)
    out = flash_mha(q, k, v, None, INTERPRET)
    ref = attention_reference(q, k, v, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_backward_matches_reference():
    q, k, v = _qkv(2, 4, 256, 8, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, None, INTERPRET) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            attention_reference(q, k, v, precision=jax.lax.Precision.HIGHEST) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_backward_qblocked_shape():
    """S=1024 exercises the q-block split (fwd grid) against the full-S bwd."""
    q, k, v = _qkv(1, 2, 1024, 8, seed=5)

    def loss_flash(q):
        return jnp.sum(flash_mha(q, k, v, None, INTERPRET) ** 2)

    def loss_ref(q):
        return jnp.sum(
            attention_reference(q, k, v, precision=jax.lax.Precision.HIGHEST) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_flash)(q)),
        np.asarray(jax.grad(loss_ref)(q)),
        atol=2e-4,
    )


@pytest.mark.parametrize("stats_env", ["1", "0"])
def test_backward_long_seq_strips(monkeypatch, stats_env):
    """S=2048 engages the q-strip-blocked backward (the monolithic kernel's
    full (S, S) f32 live set VMEM-OOMs above S=1024 — image-size-64 training
    hit this at S=4096). Covers both the stats-reuse and the local-softmax
    strip branches."""
    monkeypatch.setenv("AFDM_FLASH_STATS", stats_env)
    q, k, v = _qkv(1, 2, 2048, 8, seed=13)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, None, INTERPRET) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            attention_reference(q, k, v, precision=jax.lax.Precision.HIGHEST) ** 2
        )

    out = flash_mha(q, k, v, None, INTERPRET)
    ref = attention_reference(q, k, v, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_custom_scale():
    q, k, v = _qkv(1, 2, 256, 16, seed=7)
    out = flash_mha(q, k, v, 0.25, INTERPRET)
    ref = attention_reference(q, k, v, 0.25, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_module_flash_equals_xla(monkeypatch):
    """SelfAttention(attn_impl='flash') == attn_impl='xla' with shared params,
    forward and gradient."""
    from aliasfree_diffusion_models_pytorch_tpu.models.blocks import SelfAttention

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 32)), jnp.float32
    )
    flash_mod = SelfAttention(channels=32, precision=None, attn_impl="flash")
    xla_mod = SelfAttention(channels=32, precision=None, attn_impl="xla")
    params = flash_mod.init(random.key(0), x)

    np.testing.assert_allclose(
        np.asarray(flash_mod.apply(params, x)),
        np.asarray(xla_mod.apply(params, x)),
        atol=2e-5,
    )
    gf = jax.grad(lambda p: jnp.sum(flash_mod.apply(p, x) ** 2))(params)
    gx = jax.grad(lambda p: jnp.sum(xla_mod.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_bf16_inputs():
    q, k, v = _qkv(1, 4, 256, 8, dtype=jnp.bfloat16, seed=11)
    out = flash_mha(q, k, v, None, INTERPRET)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-2
    )


def test_vmem_cap_gate():
    """The scoped-VMEM relief engages strictly above S=4096: S<=4096 kernels
    keep Mosaic's default cap (the regression guard for the hot small-S
    shapes); larger S raises vmem_limit_bytes (measured requirement: the
    S=16384/D=32 forward allocates 16.04 MB, image-size-128 training)."""
    from aliasfree_diffusion_models_pytorch_tpu.ops.flash_attention import (
        _vmem_params,
    )

    for s in (256, 1024, 4096):
        assert _vmem_params(s) == {}
    kw = _vmem_params(16384)
    assert kw["compiler_params"].vmem_limit_bytes == 64 * 2**20
