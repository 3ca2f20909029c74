"""Experiment directory management (reference ``sb.create_experiment_directory``).

Creates the output folder, saves the (overridden) hparams file and an
environment snapshot so saved experiments are first-class reloadable — the
reference instead greps values back out of ``hyperparams.yaml``
(``evaluations/vad_shas/run_inference.sh:27-37``), which we make unnecessary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from typing import Any, Dict, Optional

import yaml

__all__ = ["create_experiment_directory"]


def create_experiment_directory(
    experiment_directory: str,
    hyperparams_to_save: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> str:
    os.makedirs(experiment_directory, exist_ok=True)

    if hyperparams_to_save is not None and os.path.isfile(hyperparams_to_save):
        shutil.copyfile(
            hyperparams_to_save,
            os.path.join(experiment_directory, "hyperparams.yaml"),
        )
    if overrides:
        with open(os.path.join(experiment_directory, "overrides.yaml"), "w") as f:
            yaml.safe_dump(
                {k: v for k, v in overrides.items()}, f, sort_keys=False
            )

    env = {
        "argv": sys.argv,
        "python": sys.version,
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    try:
        import jax

        env["jax"] = jax.__version__
        env["devices"] = [str(d) for d in jax.devices()]
    except Exception:  # pragma: no cover - jax always present in practice
        pass
    with open(os.path.join(experiment_directory, "env.json"), "w") as f:
        json.dump(env, f, indent=2)
    return experiment_directory
