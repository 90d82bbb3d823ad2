"""Self-describing, architecture-portable checkpoints.

Mirrors the reference's single-file package format (conv_tasnet.py:78-94:
hyperparams + model state + optimizer state + epoch + loss history) with a
TPU-native implementation: a single .npz of flattened pytree leaves plus a
JSON header, written atomically (tmp + rename) so preemption mid-write
never corrupts the latest checkpoint. Loading rebuilds the model config
from the stored hyperparameters (conv_tasnet.py:62-76), so checkpoints are
portable across code changes to defaults.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import ConvTasNetConfig

_SEP = "/"


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    out = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = prefix + _SEP.join(_path_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def _unflatten_into(template: Any, arrays: Dict[str, np.ndarray], prefix: str) -> Any:
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_and_leaves:
        key = prefix + _SEP.join(_path_str(p) for p in path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing array: {key}")
        arr = arrays[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model {leaf.shape}"
            )
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(
    path: str,
    cfg: ConvTasNetConfig,
    params: Any,
    state: Any,
    opt_state: Any = None,
    epoch: int = 0,
    tr_loss: Optional[list] = None,
    cv_loss: Optional[list] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write a self-describing checkpoint."""
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(params, "params/"))
    arrays.update(_flatten(state, "state/"))
    if opt_state is not None:
        arrays.update(_flatten(opt_state, "opt/"))
    header = {
        "format": "convtasnet_tpu.ckpt.v1",
        "model_config": dataclasses.asdict(cfg),
        "epoch": int(epoch),
        "tr_loss": list(map(float, tr_loss or [])),
        "cv_loss": list(map(float, cv_loss or [])),
        "has_opt": opt_state is not None,
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __header__=np.frombuffer(
                json.dumps(header).encode(), dtype=np.uint8
            ), **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_header(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        return json.loads(bytes(z["__header__"]).decode())


def load_checkpoint(
    path: str,
    params_template: Any = None,
    state_template: Any = None,
    opt_template: Any = None,
) -> Dict[str, Any]:
    """Load a checkpoint.

    Without templates, returns raw flat arrays plus the header. With
    templates (pytrees of the right structure, e.g. from init_params),
    returns reconstructed pytrees — mirroring load_model_from_package
    (conv_tasnet.py:69-76).
    """
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__header__"}
    out: Dict[str, Any] = {"header": header, "arrays": arrays}
    out["config"] = ConvTasNetConfig(**header["model_config"])
    if params_template is not None:
        out["params"] = _unflatten_into(params_template, arrays, "params/")
    if state_template is not None:
        out["state"] = _unflatten_into(state_template, arrays, "state/")
    if opt_template is not None and header.get("has_opt"):
        out["opt_state"] = _unflatten_into(opt_template, arrays, "opt/")
    return out


def load_model(path: str):
    """Rebuild (cfg, params, state) purely from the checkpoint, like
    ConvTasNet.load_model (conv_tasnet.py:62-67)."""
    from ..models.conv_tasnet import init_params

    header = load_header(path)
    cfg = ConvTasNetConfig(**header["model_config"])
    template_p, template_s = init_params(jax.random.key(0), cfg)
    out = load_checkpoint(path, params_template=template_p, state_template=template_s)
    return cfg, out["params"], out["state"]
