"""Effective implementation-choice report for run artifacts.

The ``AFDM_*`` environment knobs select kernel/implementation variants at
TRACE TIME and are then latched into lru-cached jitted executables (the
samplers in ``diffusion.py``, the train-step closure in ``train.py``) —
flipping one mid-process silently does nothing. Two runs with different
knob values therefore produce different numerics/perf, so every run
artifact (the reference-parity ``settings_{ds}_{v}.txt`` snapshot and the
``metrics.jsonl`` run header) records the knobs' *effective* values at run
start via :func:`impl_report` — the reference's settings dump has no
equivalent because torch has no trace-time latching
(``modules/ddpm_tasks.py:74-121``).

Knob inventory (defaults in parentheses):

========================  ====================================================
``AFDM_GELU``             exact | poly13 (auto: poly15 on bf16, exact erf f32)
``AFDM_RESAMPLE_IMPL``    conv | shifts (conv — measured winner, v5e)
``AFDM_FG_IMPL``          conv | phases (phases on perf path, conv on parity)
``AFDM_FLASH_ATTN``       0 | 1 (auto: TPU bf16, 256 <= S <= 16384)
``AFDM_FLASH_MIN_SEQ``    int (256)
``AFDM_FLASH_MAX_SEQ``    int (16384) — measured cap, attn_handoff.json
``AFDM_FLASH_STRIP_MIN``  int (1025) — strip-blocked flash backward threshold
``AFDM_FLASH_DQT``        0 | 1 (auto: transposed dQ accumulation at S >= 512)
``AFDM_FLASH_STATS``      0 | 1 (1 — softmax-stat reuse fwd -> bwd)
``AFDM_NATIVE_LIB``       path override for the C++ loader .so
========================  ====================================================
"""

from __future__ import annotations

import os


def impl_report() -> dict:
    """Resolved implementation choices, as latched at run start.

    Values mirror the resolution logic at each call site; ``auto(...)``
    entries describe data-dependent choices that cannot be resolved without
    shapes/dtypes.
    """
    from jax import lax

    from aliasfree_diffusion_models_pytorch_tpu.ops.flash_attention import _stats_on
    from aliasfree_diffusion_models_pytorch_tpu.ops.resample import (
        _auto_impl,
        _fg_auto_impl,
    )
    from aliasfree_diffusion_models_pytorch_tpu.utils.native import native_status

    return {
        "gelu": os.environ.get("AFDM_GELU") or "auto(bf16:poly15,f32:exact)",
        "resample_impl": _auto_impl(),
        "fg_impl_perf": _fg_auto_impl(None),
        "fg_impl_parity": _fg_auto_impl(lax.Precision.HIGHEST),
        "flash_attn": os.environ.get("AFDM_FLASH_ATTN") or "auto",
        "flash_min_seq": int(os.environ.get("AFDM_FLASH_MIN_SEQ", "256")),
        "flash_max_seq": int(os.environ.get("AFDM_FLASH_MAX_SEQ", "16384")),
        "flash_strip_min": int(os.environ.get("AFDM_FLASH_STRIP_MIN", "1025")),
        "flash_dqt": os.environ.get("AFDM_FLASH_DQT") or "auto(s>=512)",
        "flash_stats": _stats_on(),
        # Probe-only: rendering a settings dump must not spawn a g++ build.
        "native_loader": native_status(),
    }


def impl_report_text() -> str:
    """``impl.key: value`` lines for the settings_{ds}_{v}.txt snapshot."""
    return "\n".join(f"impl.{k}: {v}" for k, v in impl_report().items())
