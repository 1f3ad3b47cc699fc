"""Checkpoint save/restore (Orbax, with a plain-npz fallback).

Reference behavior: ``torch.save(model.state_dict(), model_path)`` after
every epoch, overwriting a single file; optimizer state never saved; resume
commented out (``modules/ddpm_utils.py:486-488,518``). Here:

* params (and EMA params) are always saved; opt-state optionally
  (``TrainConfig.checkpoint_opt_state``) — enabling true resume, which the
  reference lacks.
* directory layout matches the reference scheme
  (``models/DDPM_Uncondtional_{ds}_{v}/ckpt_{ds}_{v}``) for familiarity.
* Orbax ``StandardCheckpointer`` is the primary backend (async-safe,
  multi-host aware); a dependency-free ``.npz`` fallback keeps checkpoints
  usable in minimal environments.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            getattr(p, "key", None) or str(getattr(p, "idx", p)) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, state, *, save_opt_state: bool = False,
                    backend: str = "auto") -> str:
    """Save a ``TrainState``; returns the path actually written."""
    payload = {
        "params": state.params,
        "ema_params": state.ema_params,
        "step": state.step,
    }
    if save_opt_state:
        payload["opt_state"] = state.opt_state

    if backend in ("auto", "orbax"):
        try:
            import orbax.checkpoint as ocp

            path_abs = os.path.abspath(path)
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(path_abs, payload, force=True)
            ckptr.wait_until_finished()
            return path_abs
        except Exception:
            if backend == "orbax":
                raise
    npz_path = path + ".npz"
    os.makedirs(os.path.dirname(npz_path), exist_ok=True)
    np.savez(npz_path, **_flatten(payload))
    return npz_path


def restore_checkpoint(path: str, template: Any = None):
    """Restore a checkpoint payload dict.

    With a ``template`` (pytree of like-shaped arrays), Orbax restores with
    matching structure/dtypes. The npz fallback returns the flat dict.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))
    if os.path.exists(path + ".npz") or path.endswith(".npz"):
        p = path if path.endswith(".npz") else path + ".npz"
        with np.load(p) as z:
            return {k: z[k] for k in z.files}
    raise FileNotFoundError(path)
