"""Checkpointing: timed/top-k saves, retention by metric, model averaging.

Re-owns the SpeechBrain Checkpointer semantics the reference relies on
(``transformer_multitask.yaml:272-278``, ``train_multitask.py:420-424`` and
``:460-471``):

* end-of-validation saves keeping the top-``num_to_keep`` by a max-key
  metric (ACC);
* ``average_checkpoints`` over the kept set at evaluation start — parameter
  averaging of the ``model`` recoverable;
* the post-eval "ACC=1.1 trick" (save the averaged model and collapse to a
  single checkpoint, ``train_multitask.py:450-458``) works unchanged.

Storage is one directory per checkpoint (``CKPT+<timestamp>``) holding
``meta.json`` plus one msgpack file per recoverable pytree (flax
serialization; host arrays, so restore works on any topology).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["Checkpoint", "Checkpointer", "average_checkpoints"]


class Checkpoint:
    def __init__(self, path: str):
        self.path = path
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            self.meta: Dict[str, Any] = json.load(f)

    def load(self, name: str):
        fpath = os.path.join(self.path, f"{name}.msgpack")
        with open(fpath, "rb") as f:
            return serialization.msgpack_restore(f.read())

    def names(self) -> List[str]:
        return [
            f[:-8]
            for f in os.listdir(self.path)
            if f.endswith(".msgpack")
        ]

    def __repr__(self) -> str:  # pragma: no cover
        return f"Checkpoint({self.path!r})"


class Checkpointer:
    def __init__(
        self,
        checkpoints_dir: str,
        recoverables: Optional[Dict[str, Any]] = None,
        **unused,
    ):
        self.checkpoints_dir = checkpoints_dir
        # YAML-declared recoverables (objects); the trainer supplies the
        # actual pytrees at save time keyed by the same names.
        self.recoverables = recoverables or {}
        os.makedirs(checkpoints_dir, exist_ok=True)

    # ------------------------------------------------------------------ IO
    def _new_dir(self) -> str:
        stamp = time.strftime("%Y-%m-%d+%H-%M-%S")
        path = os.path.join(self.checkpoints_dir, f"CKPT+{stamp}")
        suffix = 0
        final = path
        while os.path.exists(final):
            suffix += 1
            final = f"{path}+{suffix:02d}"
        os.makedirs(final)
        return final

    def save_checkpoint(
        self, meta: Dict[str, Any], trees: Dict[str, Any]
    ) -> Checkpoint:
        path = self._new_dir()
        for name, tree in trees.items():
            # to_state_dict flattens NamedTuple states (optax) into dicts
            host_tree = serialization.to_state_dict(jax.device_get(tree))
            with open(os.path.join(path, f"{name}.msgpack"), "wb") as f:
                f.write(serialization.msgpack_serialize(host_tree))
        meta = dict(meta)
        meta.setdefault("unixtime", time.time())
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)
        return Checkpoint(path)

    def list_checkpoints(self) -> List[Checkpoint]:
        out = []
        for entry in sorted(os.listdir(self.checkpoints_dir)):
            full = os.path.join(self.checkpoints_dir, entry)
            if entry.startswith("CKPT") and os.path.isdir(full):
                if os.path.isfile(os.path.join(full, "meta.json")):
                    out.append(Checkpoint(full))
        return out

    def find_checkpoints(
        self,
        max_key: Optional[str] = None,
        min_key: Optional[str] = None,
        max_num_checkpoints: Optional[int] = None,
    ) -> List[Checkpoint]:
        ckpts = self.list_checkpoints()
        if max_key:
            ckpts = [c for c in ckpts if max_key in c.meta]
            ckpts.sort(key=lambda c: c.meta[max_key], reverse=True)
        elif min_key:
            ckpts = [c for c in ckpts if min_key in c.meta]
            ckpts.sort(key=lambda c: c.meta[min_key])
        else:
            ckpts.sort(key=lambda c: c.meta.get("unixtime", 0), reverse=True)
        if max_num_checkpoints is not None:
            ckpts = ckpts[:max_num_checkpoints]
        return ckpts

    def recover_if_possible(
        self, max_key: Optional[str] = None
    ) -> Optional[Checkpoint]:
        ckpts = self.find_checkpoints(max_key=max_key)
        return ckpts[0] if ckpts else None

    # ------------------------------------------------------------ retention
    def save_and_keep_only(
        self,
        meta: Dict[str, Any],
        trees: Dict[str, Any],
        max_keys: Optional[List[str]] = None,
        num_to_keep: int = 5,
    ) -> Checkpoint:
        ckpt = self.save_checkpoint(meta, trees)
        key = (max_keys or ["unixtime"])[0]
        ckpts = [c for c in self.list_checkpoints() if key in c.meta]
        ckpts.sort(key=lambda c: c.meta[key], reverse=True)
        for old in ckpts[num_to_keep:]:
            shutil.rmtree(old.path, ignore_errors=True)
        return ckpt


def average_checkpoints(
    checkpoints: List[Checkpoint], recoverable_name: str = "model",
    **unused,
) -> Any:
    """Arithmetic mean of a recoverable pytree across checkpoints
    (reference ``sb.utils.checkpoints.average_checkpoints``,
    ``train_multitask.py:465-467``)."""
    if not checkpoints:
        raise ValueError("no checkpoints to average")
    trees = [c.load(recoverable_name) for c in checkpoints]
    n = float(len(trees))

    def mean(*leaves):
        stacked = np.stack([np.asarray(l, np.float64) for l in leaves])
        return (stacked.sum(0) / n).astype(np.asarray(leaves[0]).dtype)

    return jax.tree_util.tree_map(mean, *trees)
