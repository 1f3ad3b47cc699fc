"""DDPM process: schedule, forward noising, and scan-compiled samplers.

Rebuild of the reference ``Diffusion`` class (``modules/ddpm_models.py:301-436``):
linear beta schedule, forward noising ``sqrt(ᾱ_t)x + sqrt(1-ᾱ_t)ε``, and
Ho-et-al. Algorithm-1 ancestral sampling — here compiled as ONE jitted
``lax.scan`` over the 999 reverse steps instead of a Python loop of 999
dispatches, including:

* ``sample`` — returns ``(final_uint8, trajectory_uint8)``; with ``theta``
  set, applies the Config-E per-step rotation *on device* as an MXU matmul
  (see ``ops/rotation.py``) — the reference does a CPU scipy round-trip
  every step (``modules/ddpm_models.py:375-376``).
* ``revert`` — trajectory-only variant (``modules/ddpm_models.py:326-350``).
* ``sample_shift`` — translation analogue, "under development" in the
  reference (``modules/ddpm_models.py:388-419``): distributes a ±shift-pixel
  horizontal translation over the steps via precomputed step indices.

Faithful quirks: ``sample_timesteps`` draws from ``[1, noise_steps)`` (t=0 is
never trained on — ``:323-324``); the reverse loop runs ``noise_steps-1 … 1``
(999 model evals, not 1000); with rotation the total applied angle is
``theta * (noise_steps-1)/noise_steps``; trajectory snapshots at every
``i % 100 == 0`` plus the final state.

RNG discipline: every sampler takes an explicit ``jax.random`` key. Passing
the same key reproduces the same initial latent and per-step noise — that is
what makes the reference's θ-sweep comparable (it re-seeds before every θ,
``modules/ddpm_tasks.py:364-366``), and it works identically here.

Sampler calling convention: ``apply_fn(params, x, t) -> eps`` with ``params``
a *traced* pytree argument — never a params-closing closure. A closure would
make jit treat every weight as a compile-time constant: megabytes of literals
in the HLO, minutes of compile, and a retrace for every new checkpoint.
``ModelFn`` (closure style) is still accepted by passing ``params=None``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from aliasfree_diffusion_models_pytorch_tpu.ops.rotation import (
    apply_pixel_operator,
    build_rotation,
    shift_nhwc,
)

ApplyFn = Callable[..., jax.Array]  # (params, x_nhwc, t) -> eps
ModelFn = Callable[[jax.Array, jax.Array], jax.Array]  # (x_nhwc, t) -> eps (legacy)


def _normalize_model(model_fn, params):
    """Accept either (apply_fn, params) or a legacy params-closing closure."""
    if params is _NO_PARAMS:
        return (lambda _p, x, t: model_fn(x, t)), None
    return model_fn, params


class _NoParams:
    """Sentinel: distinguishes 'closure-style call' from params=None."""

    def __repr__(self):
        return "<no params>"


_NO_PARAMS = _NoParams()


class Diffusion:
    """Linear-schedule DDPM process over NHWC images."""

    def __init__(
        self,
        noise_steps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        img_size: int = 256,
        snapshot_every: int = 100,
    ):
        self.noise_steps = int(noise_steps)
        self.beta_start = float(beta_start)
        self.beta_end = float(beta_end)
        self.img_size = int(img_size)
        self.snapshot_every = int(snapshot_every)
        # float32 linspace — parity with torch.linspace (modules/ddpm_models.py:314).
        self.beta = jnp.linspace(beta_start, beta_end, noise_steps, dtype=jnp.float32)
        self.alpha = 1.0 - self.beta
        self.alpha_hat = jnp.cumprod(self.alpha)

    # ------------------------------------------------------------------
    # Forward process
    # ------------------------------------------------------------------

    def noise_images(self, x: jax.Array, t: jax.Array, key: jax.Array):
        """q(x_t | x_0): returns (x_t, eps). x is NHWC in [-1, 1]."""
        sqrt_ah = jnp.sqrt(self.alpha_hat[t])[:, None, None, None]
        sqrt_one_minus_ah = jnp.sqrt(1.0 - self.alpha_hat[t])[:, None, None, None]
        eps = random.normal(key, x.shape, x.dtype)
        return sqrt_ah * x + sqrt_one_minus_ah * eps, eps

    def sample_timesteps(self, key: jax.Array, n: int) -> jax.Array:
        """Uniform t in [1, noise_steps) — t=0 never trained (reference parity)."""
        return random.randint(key, (n,), 1, self.noise_steps)

    # ------------------------------------------------------------------
    # Reverse process (ancestral sampling), one lax.scan for all variants
    # ------------------------------------------------------------------

    @property
    def _num_mid_snapshots(self) -> int:
        return (self.noise_steps - 1) // self.snapshot_every

    def _eps_fn(self, apply_fn: ApplyFn, n: int, cfg_scale: float | None):
        """Noise-prediction call, optionally conditional / CFG-guided.

        With ``labels`` and a ``cfg_scale``, runs the conditional and
        unconditional branches as ONE batch-doubled forward (label mask 1 for
        the first half, 0 for the second — the mask-0 half computes exactly
        the unconditional model) and combines them as
        ``eps_u + s * (eps_c - eps_u)`` (Ho & Salimans 2022).
        """

        def eps(params, x, t, labels):
            if labels is None:
                return apply_fn(params, x, t)
            if cfg_scale is None:
                return apply_fn(params, x, t, labels)
            xx = jnp.concatenate([x, x])
            tt = jnp.concatenate([t, t])
            yy = jnp.concatenate([labels, labels])
            mm = jnp.concatenate(
                [jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)]
            )
            e = apply_fn(params, xx, tt, yy, mm)
            e_c, e_u = e[:n], e[n:]
            return e_u + cfg_scale * (e_c - e_u)

        return eps

    def _scan_sampler(
        self,
        apply_fn: ApplyFn,
        params,
        n: int,
        channels: int,
        *,
        rot: jax.Array | None = None,
        shift: int | None = None,
        collect_trajectory: bool = True,
        labels: jax.Array | None = None,
        cfg_scale: float | None = None,
    ):
        """Build the scan body shared by sample/revert/sample_shift.

        ``rot`` is a traced (H·W, H·W) per-step rotation operator (or None):
        a θ-sweep reuses ONE compiled executable across angles.
        """
        steps = jnp.arange(self.noise_steps - 1, 0, -1)  # 999 … 1
        num_mid = self._num_mid_snapshots

        if shift:
            # Reference precomputation (modules/ddpm_models.py:395-397):
            # indices where a 1-px shift fires, first partition excluded.
            dur = abs(shift) / self.noise_steps
            idx = np.round(np.arange(0, self.noise_steps, dur)).astype(int)[1:]
            shift_mask_host = np.zeros(self.noise_steps, dtype=bool)
            shift_mask_host[idx[idx < self.noise_steps]] = True
            shift_mask = jnp.asarray(shift_mask_host)
            shift_sign = int(np.sign(shift))

        eps_fn = self._eps_fn(apply_fn, n, cfg_scale)

        def body(carry, i):
            x, key, snaps = carry
            key, nkey = random.split(key)
            t = jnp.full((n,), i, jnp.int32)
            eps = eps_fn(params, x, t, labels)
            alpha = self.alpha[i]
            alpha_hat = self.alpha_hat[i]
            beta = self.beta[i]
            z = random.normal(nkey, x.shape, x.dtype)
            z = jnp.where(i > 1, z, jnp.zeros_like(z))  # no noise at the last step
            x = (
                1.0 / jnp.sqrt(alpha)
                * (x - (1.0 - alpha) / jnp.sqrt(1.0 - alpha_hat) * eps)
                + jnp.sqrt(beta) * z
            )
            if rot is not None:
                x = apply_pixel_operator(x, rot)
            if shift:
                x = lax.cond(
                    shift_mask[i],
                    lambda h: shift_nhwc(h, shift_sign, 0),
                    lambda h: h,
                    x,
                )
            if collect_trajectory:
                slot = num_mid - i // self.snapshot_every
                snaps = lax.cond(
                    i % self.snapshot_every == 0,
                    lambda s: lax.dynamic_update_slice_in_dim(s, x[None], slot, 0),
                    lambda s: s,
                    snaps,
                )
            return (x, key, snaps), None

        return steps, body, num_mid

    def _run(
        self,
        apply_fn: ApplyFn,
        params,
        n: int,
        channels: int,
        key: jax.Array,
        **kw,
    ):
        steps, body, num_mid = self._scan_sampler(apply_fn, params, n, channels, **kw)
        key, xkey = random.split(key)
        x = random.normal(xkey, (n, self.img_size, self.img_size, channels))
        collect = kw.get("collect_trajectory", True)
        snaps = jnp.zeros((num_mid + 1, n, self.img_size, self.img_size, channels))
        (x, _, snaps), _ = lax.scan(body, (x, key, snaps), steps)
        if collect:
            snaps = lax.dynamic_update_slice_in_dim(snaps, x[None], num_mid, 0)
        return x, snaps

    @staticmethod
    def to_uint8(x: jax.Array) -> jax.Array:
        """clamp[-1,1] → [0,255] uint8 (truncating, torch ``.type`` parity)."""
        x = (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0
        return (x * 255.0).astype(jnp.uint8)

    @staticmethod
    def _normalize_labels(labels, n, cfg_scale, params):
        """Validate/broadcast sampler conditioning arguments."""
        if labels is None:
            if cfg_scale is not None:
                raise ValueError("cfg_scale requires labels")
            return None
        if params is _NO_PARAMS:
            raise ValueError(
                "conditional sampling needs the (apply_fn, params) calling "
                "convention — closure-style model_fn cannot take labels"
            )
        labels = jnp.asarray(labels, jnp.int32)
        if labels.ndim == 0:
            labels = jnp.full((n,), labels, jnp.int32)
        if labels.shape != (n,):
            raise ValueError(f"labels must be scalar or shape ({n},), got {labels.shape}")
        return labels

    def sample(
        self,
        model_fn,
        n: int,
        image_channels: int,
        key: jax.Array,
        theta: float | None = None,
        rotation_order: int = 3,
        labels: jax.Array | None = None,
        cfg_scale: float | None = None,
        params=_NO_PARAMS,
    ):
        """Ancestral sampling; returns ``(final_uint8, trajectory_uint8)``.

        ``trajectory`` stacks the intermediate states at every 100 steps plus
        the final state along the leading batch axis — shape
        ``((num_snaps)*n, H, W, C)`` — matching the reference's
        ``torch.cat(result)`` layout (``modules/ddpm_models.py:383``).
        With ``theta``, applies the Config-E per-step rotation.

        Conditional models (``UNet(num_classes=...)``): pass ``labels`` (a
        scalar class or an ``(n,)`` array). ``cfg_scale`` adds classifier-free
        guidance — requires the model to have been trained with
        ``label_dropout > 0``; scale 1.0 reduces exactly to conditional
        sampling. (Beyond-parity: the reference defines the conditional UNet
        but has no way to sample it — ``modules/ddpm_models.py:253-258``.)
        """
        apply_fn, p = _normalize_model(model_fn, params)
        labels = self._normalize_labels(labels, n, cfg_scale, params)
        rot = None
        if theta is not None:
            rot = build_rotation(
                self.img_size, float(theta) / self.noise_steps, rotation_order)
        run = self._jitted_run(
            n, image_channels, rot is not None, None, True,
            labels is not None,
            float(cfg_scale) if cfg_scale is not None else None,
        )
        x, snaps = run(apply_fn, p, key, rot, labels)
        traj = snaps.reshape((-1,) + snaps.shape[2:])
        return self.to_uint8(x), self.to_uint8(traj)

    def revert(self, model_fn, n: int, image_channels: int, key: jax.Array,
               params=_NO_PARAMS):
        """Trajectory-only denoising demo (``modules/ddpm_models.py:326-350``)."""
        apply_fn, p = _normalize_model(model_fn, params)
        run = self._jitted_run(n, image_channels, False, None, True)
        _, snaps = run(apply_fn, p, key, None, None)
        return self.to_uint8(snaps.reshape((-1,) + snaps.shape[2:]))

    def sample_shift(
        self,
        model_fn,
        n: int,
        image_channels: int,
        key: jax.Array,
        shift: int | None = None,
        params=_NO_PARAMS,
    ):
        """Translation-equivariant sampling (reference "under development")."""
        if shift == 0:
            shift = None
        apply_fn, p = _normalize_model(model_fn, params)
        run = self._jitted_run(n, image_channels, False, shift, False)
        x, _ = run(apply_fn, p, key, None, None)
        return self.to_uint8(x)

    # ------------------------------------------------------------------
    # DDIM (Song et al. 2021) — beyond-parity fast sampler
    # ------------------------------------------------------------------

    def sample_ddim(
        self,
        model_fn,
        n: int,
        image_channels: int,
        key: jax.Array,
        steps: int = 50,
        eta: float = 0.0,
        theta: float | None = None,
        rotation_order: int = 3,
        labels: jax.Array | None = None,
        cfg_scale: float | None = None,
        params=_NO_PARAMS,
    ):
        """DDIM sampling over a strided timestep subsequence.

        Not in the reference (which is DDPM-only); provided as the standard
        production fast path: ``eta=0`` is the deterministic DDIM ODE (50
        steps typically match 1000-step DDPM quality), ``eta=1`` recovers
        DDPM-style stochasticity on the subsequence. Config-E rotation
        composes: the per-step angle is scaled so the TOTAL applied rotation
        equals the DDPM sampler's ``theta * (noise_steps-1)/noise_steps``
        (the reference's convention, ``modules/ddpm_models.py:356,375`` —
        theta/noise_steps per step over noise_steps-1 steps), so sweeps can
        mix samplers without angle drift (tested in
        ``tests/test_ddim.py::test_ddim_rotation_total_angle_matches_ddpm``).

        Returns final uint8 images, shape ``(n, H, W, C)``.
        """
        apply_fn, p = _normalize_model(model_fn, params)
        labels = self._normalize_labels(labels, n, cfg_scale, params)
        steps = int(steps)
        if not 1 <= steps < self.noise_steps:
            raise ValueError(f"steps must be in [1, noise_steps), got {steps}")
        # Descending subsequence of [1, noise_steps) that always starts at
        # noise_steps-1 (pure noise); ᾱ_prev for the last entry is the
        # ᾱ_0-equivalent 1.0 (clean image).
        taus = np.unique(
            np.round(np.linspace(self.noise_steps - 1, 1, steps)).astype(np.int64)
        )[::-1]
        ahat = np.asarray(self.alpha_hat, np.float64)
        a_cur = ahat[taus]
        a_prev = np.concatenate([ahat[taus[1:]], [1.0]])
        rot = None
        if theta is not None:
            # Total DDIM rotation == total DDPM rotation (θ·(N-1)/N), spread
            # uniformly over the len(taus) applications.
            total = float(theta) * (self.noise_steps - 1) / self.noise_steps
            rot = build_rotation(
                self.img_size, total / len(taus), rotation_order)

        run = self._jitted_ddim(
            n, image_channels, len(taus), float(eta), rot is not None,
            labels is not None,
            float(cfg_scale) if cfg_scale is not None else None,
        )
        x = run(
            apply_fn, p, key,
            jnp.asarray(taus, jnp.int32),
            jnp.asarray(a_cur, jnp.float32),
            jnp.asarray(a_prev, jnp.float32),
            rot,
            labels,
        )
        return self.to_uint8(x)

    @functools.lru_cache(maxsize=64)
    def _jitted_ddim(self, n, channels, num_steps, eta, with_rotation,
                     with_labels=False, cfg_scale=None):
        @functools.partial(jax.jit, static_argnums=0)
        def run(apply_fn, params, key, taus, a_cur, a_prev, rot, labels=None):
            key, xkey = random.split(key)
            x = random.normal(xkey, (n, self.img_size, self.img_size, channels))
            eps_fn = self._eps_fn(apply_fn, n, cfg_scale)
            labels_t = labels if with_labels else None

            def body(carry, inputs):
                x, key = carry
                t, ac, ap = inputs
                key, nkey = random.split(key)
                eps = eps_fn(params, x, jnp.full((n,), t, jnp.int32), labels_t)
                x0 = (x - jnp.sqrt(1.0 - ac) * eps) / jnp.sqrt(ac)
                sigma = eta * jnp.sqrt(
                    jnp.clip((1.0 - ap) / (1.0 - ac), 0.0)
                    * jnp.clip(1.0 - ac / ap, 0.0)
                )
                dir_coeff = jnp.sqrt(jnp.clip(1.0 - ap - sigma**2, 0.0))
                z = random.normal(nkey, x.shape, x.dtype)
                x = jnp.sqrt(ap) * x0 + dir_coeff * eps + sigma * z
                if with_rotation:
                    x = apply_pixel_operator(x, rot)
                return (x, key), None

            (x, _), _ = lax.scan(body, (x, key), (taus, a_cur, a_prev))
            return x

        return run

    @functools.lru_cache(maxsize=64)
    def _jitted_run(self, n, channels, with_rotation, shift, collect,
                    with_labels=False, cfg_scale=None):
        """One compiled executable per static sampler configuration.

        ``apply_fn`` is static (a stable function/bound method); ``params``,
        the rotation operator, and the labels are traced — new checkpoints,
        new θ values, and new classes do NOT retrace.
        """

        @functools.partial(jax.jit, static_argnums=0)
        def run(apply_fn, params, key, rot, labels=None):
            return self._run(
                apply_fn,
                params,
                n,
                channels,
                key,
                rot=rot if with_rotation else None,
                shift=shift,
                collect_trajectory=collect,
                labels=labels if with_labels else None,
                cfg_scale=cfg_scale,
            )

        return run

    def __hash__(self):  # lru_cache on methods needs a hashable self
        return hash((self.noise_steps, self.beta_start, self.beta_end,
                     self.img_size, self.snapshot_every))

    def __eq__(self, other):
        return isinstance(other, Diffusion) and hash(self) == hash(other)
