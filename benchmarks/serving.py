"""Serving-throughput study: sampling imgs/sec and latency vs batch size.

The reference generates images in chunks of ``gen_per_batch=200`` through a
Python-dispatched 999-step loop (`modules/ddpm_tasks.py:332-336`,
`modules/ddpm_models.py:352-386`); it never characterizes generation
throughput. For production serving, the interesting surface is the whole
latency/throughput curve: single-image latency at batch 1 and saturated
imgs/sec at large batch, for both the parity sampler (1000-step ancestral
DDPM) and the production fast path (DDIM-50).

One process, one model init (the axon tunnel makes process startup ~4 min),
a fresh compile per (sampler, batch) shape — the persistent compile cache
(`utils/cache.py`) makes re-runs start in seconds. Every timed region ends
with a forced fetch via ``block_until_ready``.

Writes ``sample_results/serving.json``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 16, 64, 256, 1024])
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sample_results", "serving.json"))
    args = ap.parse_args()

    from bench import setup_persistent_cache
    setup_persistent_cache()

    import jax
    import jax.numpy as jnp
    from jax import random

    from aliasfree_diffusion_models_pytorch_tpu.config import FilterSettings
    from aliasfree_diffusion_models_pytorch_tpu.diffusion import Diffusion
    from aliasfree_diffusion_models_pytorch_tpu.models.unet import UNet

    def note(msg):
        print(f"[serving {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)

    on_tpu = jax.default_backend() not in ("cpu",)
    note(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    model = UNet(
        c_in=args.channels, c_out=args.channels, image_size=32, variant=3,
        filters=FilterSettings(),
        dtype=jnp.bfloat16 if on_tpu else None,
        precision=None if on_tpu else jax.lax.Precision.HIGHEST,
    )
    params = model.init_params(random.key(0), batch=1)
    d = Diffusion(noise_steps=1000, img_size=32)
    note("model initialized")

    def timed(fn, n):
        # first call = compile + run; then mean of --reps steady calls
        t0 = time.perf_counter()
        jax.block_until_ready(fn(random.key(0)))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.reps):
            out = fn(random.key(1 + i))
        jax.block_until_ready(out)
        steady = (time.perf_counter() - t0) / args.reps
        return {
            "n": n,
            "wall_s": round(steady, 4),
            "imgs_per_sec": round(n / steady, 1),
            "latency_ms_per_img": round(1000 * steady / n, 2),
            "first_call_s": round(first, 1),
        }

    rows = {"ddim50": [], "ancestral1000": []}
    for n in args.batches:
        r = timed(lambda k, n=n: d.sample_ddim(
            model.apply, n=n, image_channels=args.channels, key=k,
            steps=50, params=params), n)
        note(f"ddim50 n={n}: {r}")
        rows["ddim50"].append(r)
    for n in args.batches:
        r = timed(lambda k, n=n: d.sample(
            model.apply, n=n, image_channels=args.channels, key=k,
            params=params)[0], n)
        note(f"ancestral1000 n={n}: {r}")
        rows["ancestral1000"].append(r)

    out = {
        "study": "serving throughput/latency vs batch (variant 3, 32x32, bf16)",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "reps": args.reps,
        **rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
