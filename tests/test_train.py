"""Training-loop tests: step math, EMA semantics, checkpoint round-trip,
loss actually decreases on a tiny overfit task."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings, TrainConfig
from aliasfree_diffusion_models_pytorch_tpu.data import Dataloader, synthetic_dataset
from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
from aliasfree_diffusion_models_pytorch_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    train,
)


def tiny_config(**kw) -> TrainConfig:
    base = dict(
        run_name="test_run",
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


def test_optimizer_is_torch_adamw():
    """optax.adamw defaults differ from torch — pin wd=1e-2, eps=1e-8."""
    tx = make_optimizer(3e-4)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, _ = tx.update(grads, state, params)
    # After one step from zero moments: adam update = lr * (g/(1-b1)) /
    # (sqrt(g^2/(1-b2)) + eps) = lr; plus weight decay lr*wd*w.
    expect = -(3e-4 + 3e-4 * 1e-2 * 1.0)
    np.testing.assert_allclose(np.asarray(updates["w"]), expect, rtol=1e-4)


def test_train_step_decreases_loss():
    config = tiny_config(epochs=1)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=50, img_size=8)
    step = make_train_step(model, config, diffusion)
    ds = synthetic_dataset(n=8, image_size=8, channels=1)
    batch = jnp.asarray(ds.images[:4])
    losses = []
    for i in range(30):
        state, loss = step(state, batch, random.fold_in(random.key(1), i % 4))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30


def test_ema_semantics():
    """Reference EMA: copy for first step_start_ema steps, then blend
    (modules/ddpm_utils.py:42-47)."""
    config = tiny_config(use_ema=True, ema_beta=0.5)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=50, img_size=8)
    step = make_train_step(model, config, diffusion)
    batch = jnp.asarray(synthetic_dataset(n=4, image_size=8, channels=1).images)
    state, _ = step(state, batch, random.key(2))
    # step < 2000 → EMA params must equal the post-update params exactly.
    for a, b in zip(jax.tree.leaves(state.ema_params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_end_to_end_and_checkpoint(tmp_path):
    config = tiny_config(epochs=2)
    ds = synthetic_dataset(n=8, image_size=8, channels=1)
    dl = Dataloader(ds, batch_size=4, seed=0)
    losses = train(
        config, dl, root=str(tmp_path), sample_each_epoch=False,
        checkpoint_each_epoch=True,
    )
    assert len(losses) == 2
    assert all(np.isfinite(l) for l in losses)
    ckpt = config.checkpoint_path(str(tmp_path))
    assert os.path.isdir(ckpt) or os.path.exists(ckpt + ".npz")

    # Round-trip: restored params must match the in-memory final state.
    from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params

    model, params = _load_model_params(config, str(tmp_path))
    x = jnp.zeros((1, 8, 8, 1))
    out = model.apply(params, x, jnp.array([10]))
    assert out.shape == (1, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_train_with_sampling_writes_grid(tmp_path):
    config = tiny_config(epochs=1, noise_steps=11)
    ds = synthetic_dataset(n=4, image_size=8, channels=1)
    dl = Dataloader(ds, batch_size=4, seed=0)
    train(config, dl, root=str(tmp_path), sample_each_epoch=True,
          checkpoint_each_epoch=False)
    assert os.path.exists(os.path.join(config.results_dir(str(tmp_path)), "0.jpg"))


@pytest.mark.slow
def test_conditional_training_runs():
    """Conditional mode: labels flow through the train step and change the
    loss (label embedding is used)."""
    from jax import random as jrandom

    config = tiny_config(num_classes=10)
    model, state = create_train_state(config, jrandom.key(0))
    diffusion = Diffusion(noise_steps=50, img_size=8)
    step = make_train_step(model, config, diffusion)
    ds = synthetic_dataset(n=4, image_size=8, channels=1)
    batch = jnp.asarray(ds.images)
    labels = jnp.asarray(ds.labels)
    state, loss1 = step(state, batch, jrandom.key(1), labels)
    assert np.isfinite(float(loss1))
    # Same inputs, different labels → different loss (embedding matters).
    _, state2 = create_train_state(config, jrandom.key(0))
    _, loss2 = step(state2, batch, jrandom.key(1), (labels + 3) % 10)
    assert float(loss1) != float(loss2)


@pytest.mark.slow
def test_resume_from_checkpoint(tmp_path):
    """train(resume=True) restores params + step from the written checkpoint
    and continues counting from there."""
    from aliasfree_diffusion_models_pytorch_tpu.utils import checkpoint as ckpt_lib

    config = tiny_config(epochs=1, checkpoint_opt_state=True)
    ds = synthetic_dataset(n=8, image_size=8, channels=1)
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False)
    restored = ckpt_lib.restore_checkpoint(
        config.checkpoint_path(str(tmp_path)),
        None if False else {
            "params": create_train_state(config, random.key(0))[1].params,
            "ema_params": create_train_state(config, random.key(0))[1].params,
            "step": jnp.zeros((), jnp.int32),
            "opt_state": create_train_state(config, random.key(0))[1].opt_state,
        },
    )
    assert int(np.asarray(restored["step"])) == 2  # 8 samples / batch 4 = 2 steps

    # Second run with resume continues from step 2.
    losses = train(config, Dataloader(ds, batch_size=4, seed=0),
                   root=str(tmp_path), sample_each_epoch=False, resume=True)
    restored2 = ckpt_lib.restore_checkpoint(
        config.checkpoint_path(str(tmp_path)),
        {"params": restored["params"], "ema_params": restored["ema_params"],
         "step": jnp.zeros((), jnp.int32), "opt_state": restored["opt_state"]},
    )
    assert int(np.asarray(restored2["step"])) == 4


def test_npz_checkpoint_roundtrip_through_resume(tmp_path, monkeypatch):
    """ADVICE fix: the npz fallback must restore a *nested* payload (and,
    with a template, the exact pytree structure incl. the optax opt_state) —
    round 1 returned the flat dict and every consumer KeyError'd."""
    from aliasfree_diffusion_models_pytorch_tpu.utils import checkpoint as ckpt_lib

    config = tiny_config(epochs=1, checkpoint_opt_state=True)
    _, state = create_train_state(config, random.key(0))
    path = os.path.join(str(tmp_path), "ckpt_npz")
    written = ckpt_lib.save_checkpoint(
        path, state, save_opt_state=True, backend="npz"
    )
    assert written.endswith(".npz")

    # Template restore: exact structure back, incl. optax namedtuples.
    template = {
        "params": state.params,
        "ema_params": state.ema_params,
        "step": state.step,
        "opt_state": state.opt_state,
    }
    restored = ckpt_lib.restore_checkpoint(path, template)
    assert jax.tree_util.tree_structure(
        restored["opt_state"]
    ) == jax.tree_util.tree_structure(state.opt_state)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(
            {"params": state.params, "ema_params": state.ema_params,
             "step": state.step, "opt_state": state.opt_state})
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Template-less restore: nested dicts, indexable as restored['params'].
    restored2 = ckpt_lib.restore_checkpoint(path)
    assert "params" in restored2 and "ema_params" in restored2
    chex_leaf = jax.tree_util.tree_leaves(restored2["params"])[0]
    assert np.asarray(chex_leaf).size > 0
    assert int(np.asarray(restored2["step"])) == int(state.step)


@pytest.mark.slow
def test_train_resume_with_npz_backend(tmp_path, monkeypatch):
    """Full train → npz save → train(resume=True) path with orbax disabled
    (the default-install scenario from the advisor repro)."""
    import builtins

    real_import = builtins.__import__

    def no_orbax(name, *a, **kw):
        if name.startswith("orbax"):
            raise ImportError("orbax disabled for test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_orbax)

    config = tiny_config(epochs=1, checkpoint_opt_state=True)
    ds = synthetic_dataset(n=8, image_size=8, channels=1)
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False)
    assert os.path.exists(config.checkpoint_path(str(tmp_path)) + ".npz")
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False, resume=True)

    from aliasfree_diffusion_models_pytorch_tpu.utils import checkpoint as ckpt_lib

    restored = ckpt_lib.restore_checkpoint(config.checkpoint_path(str(tmp_path)))
    assert int(np.asarray(restored["step"])) == 4


@pytest.mark.slow
def test_base_width_decouples_capacity_from_resolution():
    """Beyond parity: base_width overrides the reference's width==image_size
    quirk. Widths (= every param shape) must match a model whose image_size
    equals that width; spatial resolution must stay at image_size; the
    default (None) must be the unchanged parity model."""
    from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet
    from aliasfree_diffusion_models_pytorch_tpu.train import build_model

    wide = UNet(c_in=1, c_out=1, image_size=8, base_width=16, variant=0)
    ref_widths = UNet(c_in=1, c_out=1, image_size=16, variant=0)
    p_wide = wide.init_params(random.key(0), batch=1)
    p_ref = ref_widths.init_params(random.key(0), batch=1)
    assert jax.tree.structure(p_wide) == jax.tree.structure(p_ref)
    for a, b in zip(jax.tree.leaves(p_wide), jax.tree.leaves(p_ref)):
        assert a.shape == b.shape

    # Forward still runs at the 8x8 resolution and returns 8x8 output.
    x = jnp.zeros((2, 8, 8, 1))
    t = jnp.ones((2,), jnp.int32)
    out = wide.apply(p_wide, x, t)
    assert out.shape == (2, 8, 8, 1)

    # Default None == the parity model, exactly (same init, same forward).
    cfg = tiny_config()
    assert cfg.base_width is None
    narrow = build_model(cfg)
    explicit = UNet(
        c_in=cfg.image_channels, c_out=cfg.image_channels,
        image_size=cfg.image_size, variant=cfg.variant,
        time_dim=cfg.time_dim, time_table_size=1024,
        precision=jax.lax.Precision.HIGHEST,
    )
    pa = narrow.init_params(random.key(1), batch=1)
    pb = explicit.init_params(random.key(1), batch=1)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Invalid width rejected.
    with pytest.raises(ValueError, match="multiple of 4"):
        UNet(c_in=1, c_out=1, image_size=8, base_width=6).init_params(
            random.key(0), batch=1
        )


@pytest.mark.slow
def test_base_width_recovered_from_persisted_config(tmp_path):
    """train() persists the config next to the checkpoint; sampling restore
    recovers shape knobs (base_width) even when the caller forgets to
    re-pass them (ADVICE r3: restore previously failed only at shape
    mismatch with no hint)."""
    import json

    from aliasfree_diffusion_models_pytorch_tpu.data import (
        Dataloader,
        synthetic_dataset,
    )
    from aliasfree_diffusion_models_pytorch_tpu.tasks import _load_model_params
    from aliasfree_diffusion_models_pytorch_tpu.train import recover_base_width

    config = tiny_config(epochs=1, base_width=16)
    ds = synthetic_dataset(n=8, image_size=8, channels=1, seed=0)
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False)

    cfg_path = os.path.join(config.model_dir(str(tmp_path)), "config.json")
    assert json.load(open(cfg_path))["base_width"] == 16

    forgot = tiny_config(epochs=1)  # base_width left at default None
    assert recover_base_width(forgot, str(tmp_path)).base_width == 16
    model, params = _load_model_params(forgot, str(tmp_path))
    assert model.base_width == 16


@pytest.mark.slow
def test_metrics_run_header_records_impl(tmp_path):
    """The metrics.jsonl run header must carry the effective AFDM_* impl
    choices (VERDICT r3 #4)."""
    import json

    from aliasfree_diffusion_models_pytorch_tpu.data import (
        Dataloader,
        synthetic_dataset,
    )

    config = tiny_config(epochs=1)
    ds = synthetic_dataset(n=8, image_size=8, channels=1, seed=0)
    train(config, Dataloader(ds, batch_size=4, seed=0), root=str(tmp_path),
          sample_each_epoch=False)
    metrics = os.path.join(config.runs_dir(str(tmp_path)), "metrics.jsonl")
    header = json.loads(open(metrics).readline())
    assert "impl" in header and "gelu" in header["impl"]
    assert "native_loader" in header["impl"]
