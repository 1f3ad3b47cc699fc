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


def _unflatten(flat: dict[str, np.ndarray]) -> dict:
    """Invert ``_flatten``: rebuild nested dicts from 'a/b/c' keys.

    Keys that were list/tuple indices come back as dicts keyed by the index
    string; consumers only index the top-level groups ('params',
    'ema_params', 'step', 'opt_state') and treat param subtrees as dicts, so
    this round-trips everything the npz path saves.
    """
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return root


def restore_checkpoint(path: str, template: Any = None):
    """Restore a checkpoint payload dict.

    With a ``template`` (pytree of like-shaped arrays), Orbax restores with
    matching structure/dtypes. The npz fallback rebuilds the nested payload
    dict (keys 'params', 'ema_params', 'step', optionally 'opt_state') from
    the flattened archive, so consumers index it the same way as an Orbax
    restore.
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
            flat = {k: z[k] for k in z.files}
        if template is not None:
            # Rebuild the exact pytree structure (incl. optax namedtuple
            # opt_state) by matching the saved keys against the template's
            # flatten-with-path keys — the same scheme _flatten used.
            tpl_flat, treedef = jax.tree_util.tree_flatten_with_path(template)
            leaves = []
            for tpl_path, tpl_leaf in tpl_flat:
                key = "/".join(
                    getattr(pp, "key", None) or str(getattr(pp, "idx", pp))
                    for pp in tpl_path
                )
                if key not in flat:
                    raise KeyError(
                        f"checkpoint {p} is missing '{key}' required by the "
                        "restore template (was it saved without opt_state?)"
                    )
                leaves.append(flat[key])
            return jax.tree_util.tree_unflatten(treedef, leaves)
        payload = _unflatten(flat)
        # 'step' flattens to a bare scalar array; keep it scalar.
        if "step" in payload and isinstance(payload["step"], np.ndarray):
            payload["step"] = payload["step"][()]
        return payload
    raise FileNotFoundError(path)
