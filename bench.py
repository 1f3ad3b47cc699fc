"""Benchmark: training throughput (imgs/sec/chip) on the flagship config.

Measures the jitted train step for UNet variant 3 (Config D — the headline
architecture of the paper) on CIFAR-10-shaped data (32x32x3), the
BASELINE.json primary metric. Runs on whatever accelerator JAX finds (the
driver provides one real TPU chip); bfloat16 compute on TPU, float32 on CPU.
If more than one accelerator is present, the step is sharded over the
production ('data', 'fsdp') mesh and throughput is reported per chip.

The reference publishes no throughput numbers and its GPU is unstated
(SURVEY.md §6). ``vs_baseline`` is therefore measured against a documented
ESTIMATE of the reference PyTorch stack on one A100: this 1.5M-param UNet
with 6 attention blocks at 32x32, torch eager, batch 16 — ~1000 imgs/sec
(small-batch eager training of this model is Python-dispatch-bound, not
FLOP-bound; see benchmarks/torch_baseline.py for the measurement behind the
estimate). The JSON additionally reports an ABSOLUTE yardstick:
compiled FLOPs/step from XLA's cost analysis and the implied MFU against
the chip's bf16 peak, so the headline number does not rest on the soft
eager-torch denominator alone.

Measurement discipline (RESULTS.md): under the axon tunnel
``block_until_ready`` does NOT reliably wait for short dispatch queues —
every timed region here ends with a forced device→host scalar fetch, and
timed iterations vary their inputs (fresh PRNG key per step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

A100_TORCH_IMGS_PER_SEC_EST = 1000.0  # documented estimate, see module docstring

# Persistent compilation cache: the bench host can have as little as ONE CPU
# core, and XLA:TPU compilation of the variant-3 train step (flash-attention
# Pallas kernels included) is host-CPU-bound — cold compiles are minutes.
# TPU cache entries are keyed by platform+HLO (no cross-host machine-feature
# trap like XLA:CPU AOT, tests/conftest.py), so a warm cache makes repeat
# invocations on the same VM start in seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _note(msg: str) -> None:
    """Progress marker on stderr (stdout carries only the final JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def setup_persistent_cache() -> None:
    """Shared persistent-compile-cache setup (see utils/cache.py); kept here
    as the import point for bench.py and benchmarks/mfu_scaling.py."""
    from aliasfree_diffusion_models_pytorch_tpu.utils.cache import (
        setup_persistent_cache as _setup,
    )

    _setup()

# Peak dense bf16 TFLOP/s per chip, by jax Device.device_kind substring
# (public spec sheets; used only for the advisory MFU figure).
_PEAK_BF16_TFLOPS = [
    ("v6", 918.0),  # Trillium / v6e
    ("v5p", 459.0),
    ("v5", 197.0),  # v5e / "TPU v5 lite"
    ("v4", 275.0),
    ("v3", 123.0),
    ("v2", 46.0),
]


def _peak_flops_per_sec(device_kind: str) -> float | None:
    kind = device_kind.lower()
    for tag, tflops in _PEAK_BF16_TFLOPS:
        if tag in kind:
            return tflops * 1e12
    return None


def _compiled_flops(jitted, *args) -> float | None:
    """FLOPs/step from XLA's cost analysis of the ALREADY-jitted callable."""
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):  # older jax returns [dict]
            analysis = analysis[0]
        flops = float(analysis["flops"])
        return flops if flops > 0 else None
    except Exception:
        return None


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import random

    setup_persistent_cache()

    from aliasfree_diffusion_models_pytorch_tpu.config import (
        FilterSettings,
        TrainConfig,
    )
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.train import (
        build_model,
        create_train_state,
        make_train_step,
        state_sharding_tree,
    )

    # Per-phase wall-clocks (VERDICT r4 weak #7): BENCH logs previously
    # couldn't distinguish backend-init/compile time from host contention —
    # each phase below is timed separately and emitted in the JSON so a
    # round-over-round compile regression is visible and attributable.
    phases: dict[str, float] = {}
    _t_phase = time.perf_counter()

    def _phase(name: str) -> None:
        nonlocal _t_phase
        now = time.perf_counter()
        phases[name] = round(now - _t_phase, 1)
        _t_phase = now

    on_tpu = jax.default_backend() not in ("cpu",)
    n_devices = len(jax.devices())
    _phase("backend_init_s")
    batch = (256 if on_tpu else 16) * max(1, n_devices if on_tpu else 1)
    config = TrainConfig(
        run_name="bench",
        epochs=1,
        batch_size=batch,
        image_size=32,
        image_channels=3,
        dataset="CIFAR10",
        dataset_path=None,
        lr=3e-4,
        noise_steps=1000,
        variant=3,
        filters=FilterSettings(),
        compute_dtype="bfloat16" if on_tpu else "float32",
    )

    _note(f"backend={jax.default_backend()} devices={n_devices} batch={batch}")
    model, state = create_train_state(config, random.key(0))
    diffusion = Diffusion(noise_steps=1000, img_size=32)
    _note("train state created")
    _phase("state_init_s")

    mesh = None
    if on_tpu and n_devices > 1:
        # Multi-chip hardware: measure the production sharded step the day
        # it appears. data-parallel x fsdp, same layout as train()/dryrun.
        from aliasfree_diffusion_models_pytorch_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
        )

        shape = (n_devices // 2, 2) if n_devices % 2 == 0 and n_devices >= 4 \
            else (n_devices, 1)
        mesh = make_mesh(shape, ("data", "fsdp"))
        st_shard = state_sharding_tree(mesh, state)
        state = jax.device_put(state, st_shard)
        step = make_train_step(model, config, diffusion, mesh,
                               state_shardings=st_shard)
    else:
        step = make_train_step(model, config, diffusion, mesh=None)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, 32, 32, 3)).astype(np.float32))
    if mesh is not None:
        images = jax.device_put(images, batch_sharding(mesh))

    # FLOPs from the compiled executable (mesh=None path only: the AOT
    # lowering of the sharded wrapper differs; single-chip is the MFU story).
    flops_per_step = None
    if mesh is None:
        flops_per_step = _compiled_flops(step, state, images, random.key(0))
        _note(f"cost analysis done: flops_per_step={flops_per_step}")
    _phase("cost_analysis_s")

    # Warmup/compile.
    for i in range(3):
        state, loss = step(state, images, random.key(i))
    float(loss)  # forced fetch — drains the dispatch queue before timing
    _note("train step compiled + warm")
    _phase("train_compile_warm_s")

    n_steps = 30 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, images, random.key(100 + i))
    final_loss = float(loss)  # forced device→host fetch INSIDE the timed region
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_steps / dt
    step_s = dt / n_steps
    _phase("train_measure_s")

    mfu = None
    peak = _peak_flops_per_sec(jax.devices()[0].device_kind) if on_tpu else None
    if flops_per_step and peak:
        mfu = flops_per_step / step_s / peak

    # Secondary metrics: full 1000-step ancestral sampling and DDIM-50
    # wall-clock (each chain is one compiled lax.scan; rotated Config-E
    # costs the same). Timed per the discipline note: scalar fetch at the
    # end, fresh key vs the warmup run.
    sample_wall = ddim_wall = None
    if on_tpu:
        model_s = build_model(config)
        sparams = model_s.init_params(random.key(0), batch=1)

        def timed(fn, iters=3):
            out = fn(random.key(0))  # compile + warmup
            float(np.uint64(np.asarray(out).sum()))  # drain the queue
            t0 = time.perf_counter()
            for i in range(iters):
                final = fn(random.key(1 + i))
                # forced fetch EVERY iteration: under the axon tunnel a
                # single enqueued scan can report dispatch time, not run time
                float(np.uint64(np.asarray(final).sum()))
            return round((time.perf_counter() - t0) / iters, 3)

        _note("timing train loop done; compiling samplers")
        sample_wall = timed(lambda k: diffusion.sample(
            model_s.apply, n=16, image_channels=3, key=k, params=sparams)[0])
        _note(f"ancestral sampler timed: {sample_wall}s")
        ddim_wall = timed(lambda k: diffusion.sample_ddim(
            model_s.apply, n=16, image_channels=3, key=k, steps=50,
            params=sparams))
        _note(f"ddim sampler timed: {ddim_wall}s")
    _phase("samplers_s")

    # 64x64 regime (the CelebA-64 knob of Train.ipynb cell 4): S=4096
    # attention via the q-strip-blocked flash backward. Single-chip only;
    # batch 32 (the measured-best small-batch point, RESULTS.md round 3).
    t64 = {}
    if on_tpu and mesh is None:
        import dataclasses as _dc

        config64 = _dc.replace(config, image_size=64, batch_size=32,
                               run_name="bench64")
        model64, state64 = create_train_state(config64, random.key(0))
        diffusion64 = Diffusion(noise_steps=1000, img_size=64)
        step64 = make_train_step(model64, config64, diffusion64, mesh=None)
        images64 = jnp.asarray(
            rng.standard_normal((32, 64, 64, 3)).astype(np.float32))
        flops64 = _compiled_flops(step64, state64, images64, random.key(0))
        for i in range(3):
            state64, loss64 = step64(state64, images64, random.key(i))
        float(loss64)
        _note("64x64 train step compiled + warm")
        t0 = time.perf_counter()
        for i in range(10):
            state64, loss64 = step64(state64, images64, random.key(200 + i))
        float(loss64)  # forced fetch inside the timed region
        step64_s = (time.perf_counter() - t0) / 10
        t64 = {
            "train64_step_ms": round(1000 * step64_s, 2),
            "train64_imgs_per_sec_b32": round(32 / step64_s, 1),
            "train64_flops_per_step": flops64,
            "train64_mfu": round(flops64 / step64_s / peak, 4)
            if (flops64 and peak) else None,
        }
        _note(f"64x64 regime timed: {t64}")
    _phase("train64_s")

    out = {
        "metric": "train_imgs_per_sec_chip",
        "value": round(imgs_per_sec / max(1, n_devices if mesh is not None else 1), 1),
        "unit": "imgs/sec/chip (CIFAR-10 32x32, UNet variant 3 / Config D)",
        "vs_baseline": round(
            imgs_per_sec / max(1, n_devices if mesh is not None else 1)
            / A100_TORCH_IMGS_PER_SEC_EST, 3),
        "batch_size": batch,
        "n_devices": n_devices,
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "compute_dtype": config.compute_dtype,
        "step_ms": round(1000 * step_s, 2),
        "final_loss": final_loss,
        "flops_per_step": flops_per_step,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "sample_1000step_n16_wall_s": sample_wall,
        "ddim_50step_n16_wall_s": ddim_wall,
        **t64,
        "phase_s": phases,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
