"""Production optimizer knobs: LR schedules, gradient accumulation, clipping.

All opt-in via TrainConfig (``lr_schedule`` / ``grad_accum`` / ``grad_clip``);
the defaults must stay bitwise-identical to the reference's plain
``optim.AdamW(lr)`` (modules/ddpm_utils.py:489), which
``tests/test_train.py::test_optimizer_is_torch_adamw`` pins. These tests pin
the opt-in paths: schedule wiring equals the hand-built optax chain,
accumulated micro-steps reproduce full-batch updates, the EMA holds still
between emits, and the MultiSteps optimizer state survives checkpointing
and fsdp sharding.
"""

import json
import os

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax import random

from aliasfree_diffusion_models_pytorch_tpu.config import TrainConfig
from aliasfree_diffusion_models_pytorch_tpu.data import Dataloader, synthetic_dataset
from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
from aliasfree_diffusion_models_pytorch_tpu.train import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    train,
)


def tiny_config(**kw) -> TrainConfig:
    base = dict(
        run_name="test_knobs",
        epochs=1,
        batch_size=4,
        image_size=8,
        image_channels=1,
        dataset="synthetic",
        dataset_path=None,
        lr=3e-4,
        noise_steps=50,
        image_gen_n=2,
        variant=0,
        seed=0,
        gen_total=0,
    )
    base.update(kw)
    return TrainConfig(**base)


# --------------------------------------------------------------------------
# make_optimizer wiring
# --------------------------------------------------------------------------

def test_default_config_optimizer_matches_bare_lr():
    """TrainConfig defaults must produce the exact parity optimizer."""
    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.full((4, 4), 0.3)}
    tx_cfg = make_optimizer(tiny_config())
    tx_lr = make_optimizer(3e-4)
    u_cfg, _ = tx_cfg.update(grads, tx_cfg.init(params), params)
    u_lr, _ = tx_lr.update(grads, tx_lr.init(params), params)
    np.testing.assert_array_equal(np.asarray(u_cfg["w"]), np.asarray(u_lr["w"]))


def test_warmup_cosine_equals_handbuilt_chain():
    """Schedule wiring (peak/warmup/horizon/floor) == the explicit optax tx."""
    lr, warmup, total, floor = 1e-3, 3, 10, 0.1
    config = tiny_config(
        lr=lr, lr_schedule="warmup_cosine", warmup_steps=warmup,
        lr_total_steps=total, lr_min_ratio=floor,
    )
    tx = make_optimizer(config)
    expected = optax.adamw(
        optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup,
            decay_steps=total, end_value=lr * floor,
        ),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-2,
    )
    params = {"w": jnp.ones((3, 3))}
    s_a, s_b = tx.init(params), expected.init(params)
    p_a = p_b = params
    rng = np.random.default_rng(0)
    for _ in range(6):
        g = {"w": jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)}
        u_a, s_a = tx.update(g, s_a, p_a)
        u_b, s_b = expected.update(g, s_b, p_b)
        p_a = optax.apply_updates(p_a, u_a)
        p_b = optax.apply_updates(p_b, u_b)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warmup_cosine_requires_horizon():
    config = tiny_config(lr_schedule="warmup_cosine")
    with pytest.raises(ValueError, match="decay horizon"):
        make_optimizer(config)


def test_grad_clip_bounds_update():
    """With an aggressive global-norm clip the first update shrinks."""
    params = {"w": jnp.zeros((4, 4))}  # zero params -> no weight-decay term
    grads = {"w": jnp.full((4, 4), 100.0)}
    # Clip far below Adam's eps (1e-8): each clipped grad element lands at
    # ~2.5e-11, so m̂/(sqrt(v̂)+eps) ≈ g/eps collapses instead of ≈ 1.
    tx_free = make_optimizer(tiny_config())
    tx_clip = make_optimizer(tiny_config(grad_clip=1e-10))
    u_free, _ = tx_free.update(grads, tx_free.init(params), params)
    u_clip, _ = tx_clip.update(grads, tx_clip.init(params), params)
    # Adam normalizes huge grads back to ~lr steps; the clipped grads sit at
    # eps scale where the normalization collapses, so the update is tiny.
    assert np.max(np.abs(np.asarray(u_clip["w"]))) < 0.1 * np.max(
        np.abs(np.asarray(u_free["w"]))
    )


def test_config_validation():
    with pytest.raises(ValueError, match="lr_schedule"):
        tiny_config(lr_schedule="linear")
    with pytest.raises(ValueError, match="grad_accum"):
        tiny_config(grad_accum=0)
    with pytest.raises(ValueError, match="grad_clip"):
        tiny_config(grad_clip=-1.0)
    with pytest.raises(ValueError, match="lr_min_ratio"):
        tiny_config(lr_min_ratio=1.5)
    with pytest.raises(ValueError, match="warmup_steps"):
        tiny_config(warmup_steps=-1)


# --------------------------------------------------------------------------
# gradient accumulation semantics inside the train step
# --------------------------------------------------------------------------

def _fixed_batch(config):
    ds = synthetic_dataset(
        n=config.batch_size, image_size=config.image_size,
        channels=config.image_channels,
    )
    return jnp.asarray(ds.images)


@pytest.mark.slow
def test_grad_accum_emits_every_kth_step():
    config = tiny_config(grad_accum=2)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
    step = make_train_step(model, config, diffusion)
    batch = _fixed_batch(config)
    # Snapshot to host: the jitted step donates its input state buffers.
    p0 = [np.asarray(x) for x in jax.tree.leaves(state.params)]

    state, _ = step(state, batch, random.key(1))
    for a, b in zip(p0, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # no emit yet

    state, _ = step(state, batch, random.key(2))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(p0, jax.tree.leaves(state.params))
    )
    assert changed, "second micro-step must emit an optimizer update"


@pytest.mark.slow
def test_grad_accum_identical_grads_match_plain_steps():
    """k identical micro-batches average to the same grad -> same trajectory.

    Feeding the SAME (batch, key) to every micro-step makes each micro-grad
    bitwise identical, so MultiSteps' mean over k of them equals one plain
    step's grad exactly — 2k accumulated micro-steps must land on the same
    params as 2 plain steps.
    """
    cfg_acc = tiny_config(grad_accum=2)
    cfg_one = tiny_config()
    model, state_acc = create_train_state(cfg_acc, random.key(0))
    _, state_one = create_train_state(cfg_one, random.key(0))
    diffusion = Diffusion(noise_steps=50, img_size=8)
    step_acc = make_train_step(model, cfg_acc, diffusion)
    step_one = make_train_step(model, cfg_one, diffusion)
    batch = _fixed_batch(cfg_acc)
    key = random.key(7)

    for _ in range(2):
        state_one, loss_one = step_one(state_one, batch, key)
        for _ in range(2):
            state_acc, loss_acc = step_acc(state_acc, batch, key)
        np.testing.assert_allclose(float(loss_acc), float(loss_one), rtol=1e-6)

    for a, b in zip(jax.tree.leaves(state_acc.params), jax.tree.leaves(state_one.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_ema_holds_still_between_emits():
    """After step_start_ema, the EMA must only blend on emit micro-steps."""
    config = tiny_config(grad_accum=2, use_ema=True)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
    step = make_train_step(model, config, diffusion)
    # Jump past step_start_ema (2000) so the blend branch is active, and give
    # the EMA a distinct value so "held still" is observable.
    marked_ema = jax.tree.map(lambda p: p + 1.0, state.params)
    # Snapshot to host: the jitted step donates its input state buffers.
    marked_host = [np.asarray(x) for x in jax.tree.leaves(marked_ema)]
    state = TrainState(
        params=state.params, opt_state=state.opt_state,
        ema_params=marked_ema, step=jnp.asarray(4000, jnp.int32),
    )
    batch = _fixed_batch(config)

    state, _ = step(state, batch, random.key(1))  # mini_step 0 -> 1: no emit
    for a, b in zip(marked_host, jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    state, _ = step(state, batch, random.key(2))  # mini_step 1 -> 0: emit
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(marked_host, jax.tree.leaves(state.ema_params))
    )
    assert moved, "EMA must blend on the emit step"


# --------------------------------------------------------------------------
# integration: train() horizon derivation, checkpointing, sharding
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_train_derives_cosine_horizon(tmp_path):
    config = tiny_config(lr_schedule="warmup_cosine", warmup_steps=1, epochs=2)
    ds = synthetic_dataset(n=8, image_size=8, channels=1)
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False, checkpoint_each_epoch=False)
    with open(os.path.join(config.model_dir(str(tmp_path)), "config.json")) as f:
        stored = json.load(f)
    # 8 images / batch 4 = 2 steps/epoch, 2 epochs, accum 1 -> 4 updates.
    assert stored["lr_total_steps"] == 4
    assert stored["lr_schedule"] == "warmup_cosine"


@pytest.mark.slow
def test_checkpoint_roundtrip_multisteps_state(tmp_path):
    """The MultiSteps optimizer state must survive save/restore exactly."""
    from aliasfree_diffusion_models_pytorch_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    config = tiny_config(grad_accum=3, grad_clip=1.0)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
    step = make_train_step(model, config, diffusion)
    batch = _fixed_batch(config)
    state, _ = step(state, batch, random.key(1))  # mini_step=1: mid-window

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, save_opt_state=True)
    template = {"params": state.params, "ema_params": state.ema_params,
                "step": state.step, "opt_state": state.opt_state}
    payload = restore_checkpoint(path, template=template)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(payload["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The restored mid-window state must continue the accumulation exactly.
    restored = TrainState(
        params=payload["params"], opt_state=payload["opt_state"],
        ema_params=payload["ema_params"],
        step=jnp.asarray(payload["step"], jnp.int32),
    )
    state, loss_live = step(state, batch, random.key(2))
    _, loss_restored = step(restored, batch, random.key(2))
    np.testing.assert_allclose(float(loss_live), float(loss_restored), rtol=1e-6)


@pytest.mark.slow
def test_grad_accum_state_shards_over_fsdp_mesh():
    """MultiSteps' param-shaped accumulator leaves follow the ZeRO-3 layout."""
    from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )
    from aliasfree_diffusion_models_pytorch_tpu.train import state_sharding_tree

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU pool")
    config = tiny_config(grad_accum=2, batch_size=8)
    model, state = create_train_state(config, random.key(0))
    mesh = make_mesh((4, 2), ("data", "fsdp"), devices=jax.devices()[:8])
    st_shard = state_sharding_tree(mesh, state)
    state = jax.device_put(state, st_shard)
    diffusion = Diffusion(noise_steps=config.noise_steps, img_size=config.image_size)
    step = make_train_step(model, config, diffusion, mesh, state_shardings=st_shard)
    batch = jax.device_put(_fixed_batch(config), batch_sharding(mesh))
    state, loss1 = step(state, batch, random.key(1))
    state, loss2 = step(state, batch, random.key(1))
    # Identical (batch, key) micro-grads: the emitted mean equals each
    # micro-grad, and the loss is key-deterministic.
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    assert int(state.step) == 2
