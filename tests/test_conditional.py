"""Class-conditional training + classifier-free-guidance sampling.

The reference defines the conditional UNet (label embedding added to the
time embedding, ``modules/ddpm_models.py:253-258``) but its pipeline never
trains or samples it. Here the conditional path is first-class: label
dropout during training (Ho & Salimans 2022) and CFG-guided samplers.

Key invariants tested:
* a label mask of 0 reduces the conditional forward EXACTLY to the
  unconditional forward (that is what makes the batched CFG pass correct);
* ``cfg_scale=1`` is identical to plain conditional sampling;
* the conditional train step (with and without label dropout) runs, updates
  the label embedding, and stays finite;
* `train()` threads labels end-to-end when ``num_classes`` is set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from aliasfree_diffusion_models_pytorch_tpu.config import (
    FilterSettings,
    TrainConfig,
)
from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet


IMG = 8
N_CLASSES = 10


@pytest.fixture(scope="module")
def cond_model():
    model = UNet(c_in=1, c_out=1, image_size=IMG, variant=0, num_classes=N_CLASSES)
    params = model.init_params(random.key(0), batch=2)
    return model, params


@pytest.mark.slow
def test_mask_zero_equals_unconditional(cond_model):
    model, params = cond_model
    x = random.normal(random.key(1), (4, IMG, IMG, 1))
    t = jnp.array([1, 5, 9, 3], jnp.int32)
    y = jnp.array([0, 3, 7, 9], jnp.int32)

    uncond = model.apply(params, x, t)
    masked = model.apply(params, x, t, y, jnp.zeros((4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(uncond), np.asarray(masked))

    # mask of ones == plain conditional call
    cond = model.apply(params, x, t, y)
    ones = model.apply(params, x, t, y, jnp.ones((4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(cond), np.asarray(ones))

    # and the conditional forward really uses the label
    assert not np.allclose(np.asarray(cond), np.asarray(uncond))


def test_mixed_mask_is_per_sample(cond_model):
    model, params = cond_model
    x = random.normal(random.key(2), (2, IMG, IMG, 1))
    t = jnp.array([4, 4], jnp.int32)
    y = jnp.array([2, 2], jnp.int32)
    mixed = model.apply(params, x, t, y, jnp.array([1.0, 0.0]))
    cond = model.apply(params, x, t, y)
    uncond = model.apply(params, x, t)
    np.testing.assert_array_equal(np.asarray(mixed[0]), np.asarray(cond[0]))
    np.testing.assert_array_equal(np.asarray(mixed[1]), np.asarray(uncond[1]))


def _cond_config(**kw):
    base = dict(
        run_name="cond_test", epochs=1, batch_size=8, image_size=IMG,
        image_channels=1, dataset="synthetic", dataset_path=None, lr=3e-4,
        noise_steps=20, variant=3, filters=FilterSettings(),
        num_classes=N_CLASSES, seed=0,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.parametrize("dropout", [0.0, 0.5])
def test_conditional_train_step(dropout):
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_train_step,
    )

    config = _cond_config(label_dropout=dropout)
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=20, img_size=IMG)
    step = make_train_step(model, config, diffusion, mesh=None)

    emb_before = np.asarray(
        jax.tree.leaves(state.params["params"]["label_emb"])[0]
    ).copy()
    images = np.asarray(random.normal(random.key(1), (8, IMG, IMG, 1)))
    labels = jnp.arange(8, dtype=jnp.int32) % N_CLASSES
    for i in range(2):
        state, loss = step(state, jnp.asarray(images), random.key(i), labels)
    assert np.isfinite(float(loss))
    emb_after = np.asarray(jax.tree.leaves(state.params["params"]["label_emb"])[0])
    # label embedding received gradient (rows for the used labels moved)
    assert not np.allclose(emb_before, emb_after)


def test_label_dropout_validation():
    with pytest.raises(ValueError, match="label_dropout"):
        _cond_config(label_dropout=1.5)
    with pytest.raises(ValueError, match="num_classes"):
        _cond_config(num_classes=None, label_dropout=0.1)


def test_cfg_scale_one_equals_conditional(cond_model):
    model, params = cond_model
    d = Diffusion(noise_steps=10, img_size=IMG, snapshot_every=5)
    kw = dict(n=2, image_channels=1, key=random.key(3), params=params)
    cond, _ = d.sample(model.apply, labels=jnp.array([1, 4]), **kw)
    cfg1, _ = d.sample(model.apply, labels=jnp.array([1, 4]), cfg_scale=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(cond), np.asarray(cfg1))

    # a real guidance scale changes the output
    cfg3, _ = d.sample(model.apply, labels=jnp.array([1, 4]), cfg_scale=3.0, **kw)
    assert not np.array_equal(np.asarray(cond), np.asarray(cfg3))


def test_scalar_label_broadcasts(cond_model):
    model, params = cond_model
    d = Diffusion(noise_steps=10, img_size=IMG, snapshot_every=5)
    kw = dict(n=3, image_channels=1, key=random.key(4), params=params)
    scalar, _ = d.sample(model.apply, labels=7, **kw)
    arr, _ = d.sample(model.apply, labels=jnp.array([7, 7, 7]), **kw)
    np.testing.assert_array_equal(np.asarray(scalar), np.asarray(arr))


def test_ddim_conditional_and_cfg(cond_model):
    model, params = cond_model
    d = Diffusion(noise_steps=20, img_size=IMG)
    kw = dict(n=2, image_channels=1, key=random.key(5), steps=5, params=params)
    cond = d.sample_ddim(model.apply, labels=jnp.array([0, 9]), **kw)
    cfg1 = d.sample_ddim(model.apply, labels=jnp.array([0, 9]), cfg_scale=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(cond), np.asarray(cfg1))
    assert cond.shape == (2, IMG, IMG, 1)


def test_sampler_label_validation(cond_model):
    model, params = cond_model
    d = Diffusion(noise_steps=10, img_size=IMG)
    with pytest.raises(ValueError, match="cfg_scale requires labels"):
        d.sample(model.apply, n=2, image_channels=1, key=random.key(0),
                 cfg_scale=2.0, params=params)
    with pytest.raises(ValueError, match="labels must be scalar or shape"):
        d.sample(model.apply, n=2, image_channels=1, key=random.key(0),
                 labels=jnp.array([1, 2, 3]), params=params)
    with pytest.raises(ValueError, match="closure-style"):
        d.sample(lambda x, t: x, n=2, image_channels=1, key=random.key(0),
                 labels=jnp.array([1, 2]))


@pytest.mark.slow
def test_train_end_to_end_conditional(tmp_path):
    """`train()` threads dataloader labels through to the model when
    num_classes is set (sample_each_epoch off to keep it fast)."""
    from aliasfree_diffusion_models_pytorch_tpu.data import (
        Dataloader,
        synthetic_dataset,
    )
    from aliasfree_diffusion_models_pytorch_tpu.train import train

    config = _cond_config(label_dropout=0.1, batch_size=8, variant=0,
                          filters=None)
    ds = synthetic_dataset(n=16, image_size=IMG, channels=1, seed=0)
    dl = Dataloader(ds, batch_size=8, seed=0)
    losses = train(
        config, dl, root=str(tmp_path), sample_each_epoch=False,
        checkpoint_each_epoch=False, prefetch=False,
    )
    assert len(losses) == 1 and np.isfinite(losses[0])


def test_conditional_composes_with_rotation(cond_model):
    """Config-E rotation and CFG conditioning are independent sampler
    features; both applied at once must run and stay deterministic."""
    model, params = cond_model
    d = Diffusion(noise_steps=10, img_size=IMG, snapshot_every=5)
    kw = dict(n=2, image_channels=1, key=random.key(6), params=params,
              labels=jnp.array([2, 5]), cfg_scale=2.0, theta=45.0)
    a, _ = d.sample(model.apply, **kw)
    b, _ = d.sample(model.apply, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, IMG, IMG, 1)


@pytest.mark.slow
def test_conditional_sharded_step_matches_single_device():
    """Labels shard over the data axis like the batch; a conditional train
    step on the virtual mesh must reproduce single-device numerics."""
    from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        create_train_state,
        make_train_step,
    )

    config = _cond_config(label_dropout=0.5, batch_size=8, variant=0,
                          filters=None)
    diffusion = Diffusion(noise_steps=20, img_size=IMG)
    images = jnp.asarray(
        np.asarray(random.normal(random.key(1), (8, IMG, IMG, 1)))
    )
    labels = jnp.arange(8, dtype=jnp.int32) % N_CLASSES

    model, state_s = create_train_state(config, random.key(0))
    step_single = make_train_step(model, config, diffusion, mesh=None)
    state_s, loss_single = step_single(state_s, images, random.key(2), labels)

    mesh = make_mesh(devices=jax.devices()[:4])
    _, state_m = create_train_state(config, random.key(0))
    step_mesh = make_train_step(model, config, diffusion, mesh)
    batch = jax.device_put(images, batch_sharding(mesh))
    lab = jax.device_put(labels, batch_sharding(mesh, ndim=1))
    state_m, loss_mesh = step_mesh(state_m, batch, random.key(2), lab)

    np.testing.assert_allclose(float(loss_mesh), float(loss_single), rtol=1e-6)
    a = jax.tree.leaves(state_s.params)[0]
    b = jax.tree.leaves(state_m.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
