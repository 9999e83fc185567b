"""Pytree checkpointing with the reference's save/resume semantics.

The reference saves `{"model", "opt", "step", "in_dim", "cfg"}` every
`ckpt_every` steps via torch.save and resumes model/opt/step by default
(src/train.py:84-92,142-148). Here checkpoints are a single .npz holding
every leaf of the `{params, opt_state}` pytrees (flattened with their
tree paths as keys) plus step and a JSON metadata blob — atomic
(write-to-temp + rename), host-portable, and framework-free.

Restore is template-based: callers provide freshly-initialized
params/opt_state pytrees and leaves are matched by flatten order with a
structure fingerprint check — the idiomatic JAX answer to loading into
arbitrary optimizer states (optax chains of namedtuples).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any, str]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef, str(treedef)


def save_checkpoint(
    path: str,
    params,
    opt_state,
    step: int,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write params/opt_state/step (+ JSON-able meta) to .npz."""
    p_leaves, _, p_struct = _flatten(params)
    o_leaves, _, o_struct = _flatten(opt_state)
    payload = {f"param_{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
    payload.update({f"opt_{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
    payload["step"] = np.asarray(step, dtype=np.int64)
    payload["meta"] = np.asarray(
        json.dumps(
            {
                "meta": meta or {},
                "param_struct": p_struct,
                "opt_struct": o_struct,
                "n_params": len(p_leaves),
                "n_opt": len(o_leaves),
            }
        )
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def restore_checkpoint(path: str, params_template, opt_state_template):
    """Load a checkpoint into the shapes of freshly-initialized templates.

    Returns (params, opt_state, step, meta_dict). Raises ValueError if
    the stored tree structures don't match the templates.
    """
    with np.load(path, allow_pickle=False) as z:
        info = json.loads(str(z["meta"]))
        p_leaves, p_def, p_struct = _flatten(params_template)
        o_leaves, o_def, o_struct = _flatten(opt_state_template)
        if info["param_struct"] != p_struct or info["n_params"] != len(p_leaves):
            raise ValueError(
                "checkpoint param structure mismatch: "
                f"stored {info['param_struct']} vs template {p_struct}"
            )
        if info["opt_struct"] != o_struct or info["n_opt"] != len(o_leaves):
            raise ValueError("checkpoint optimizer-state structure mismatch")

        def _load(key_fmt, leaves, template_tree, what):
            # Structure fingerprints match but shapes may not (e.g. a
            # checkpoint from a different hidden width): name the leaf.
            paths = [
                jax.tree_util.keystr(kp)
                for kp, _ in jax.tree_util.tree_flatten_with_path(template_tree)[0]
            ]
            out = []
            for i, t in enumerate(leaves):
                arr = np.asarray(z[key_fmt.format(i)])
                tmpl = np.asarray(t)
                if arr.shape != tmpl.shape:
                    raise ValueError(
                        f"checkpoint {what} leaf {paths[i]} has shape "
                        f"{arr.shape} but the template (current config) "
                        f"expects {tmpl.shape} — config/checkpoint mismatch"
                    )
                out.append(arr.astype(tmpl.dtype))
            return out

        new_p = _load("param_{}", p_leaves, params_template, "param")
        new_o = _load("opt_{}", o_leaves, opt_state_template, "opt-state")
        step = int(z["step"])
    params = jax.tree_util.tree_unflatten(p_def, new_p)
    opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
    return params, opt_state, step, info["meta"]


def restore_params(path: str, params_template):
    """Load ONLY the model params (+ step, meta) from a checkpoint.

    For render-only consumers (eval CLI, make_gif): the optimizer state
    is ignored entirely, so checkpoints written under any optimizer
    configuration (e.g. --lr-decay-steps changes the optax state
    structure) load interchangeably. restore_checkpoint would reject
    them on the opt-state fingerprint even though rendering never
    touches it."""
    with np.load(path, allow_pickle=False) as z:
        info = json.loads(str(z["meta"]))
        p_leaves, p_def, p_struct = _flatten(params_template)
        if info["param_struct"] != p_struct or info["n_params"] != len(p_leaves):
            raise ValueError(
                "checkpoint param structure mismatch: "
                f"stored {info['param_struct']} vs template {p_struct}"
            )
        paths = [
            jax.tree_util.keystr(kp)
            for kp, _ in jax.tree_util.tree_flatten_with_path(params_template)[0]
        ]
        out = []
        for i, t in enumerate(p_leaves):
            arr = np.asarray(z[f"param_{i}"])
            tmpl = np.asarray(t)
            if arr.shape != tmpl.shape:
                raise ValueError(
                    f"checkpoint param leaf {paths[i]} has shape "
                    f"{arr.shape} but the template (current config) "
                    f"expects {tmpl.shape} — config/checkpoint mismatch"
                )
            out.append(arr.astype(tmpl.dtype))
        step = int(z["step"])
    return jax.tree_util.tree_unflatten(p_def, out), step, info["meta"]


def latest_exists(path: str) -> bool:
    return os.path.exists(path)


def save_checkpoint_rotating(
    path: str,
    params,
    opt_state,
    step: int,
    meta: Optional[Dict[str, Any]] = None,
    keep: int = 3,
) -> None:
    """save_checkpoint + retain the last `keep` step-stamped copies.

    Writes `path` (the latest, reference-schema semantics) and
    `path.step{N}.npz` history, pruning older history files — cheap
    insurance against a corrupt final write or a bad training excursion.
    """
    save_checkpoint(path, params, opt_state, step, meta)
    base = os.path.abspath(path)
    hist = f"{base}.step{step:08d}.npz"
    import shutil

    shutil.copyfile(base, hist)
    prefix = os.path.basename(base) + ".step"
    dirname = os.path.dirname(base)
    history = sorted(
        f for f in os.listdir(dirname) if f.startswith(prefix) and f.endswith(".npz")
    )
    for old in history[:-keep]:
        os.unlink(os.path.join(dirname, old))
