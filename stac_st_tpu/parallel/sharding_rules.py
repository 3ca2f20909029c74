"""Tensor-parallel parameter sharding rules (the mesh 'model' axis).

The reference has no tensor parallelism (SURVEY.md §2.4 — largest preset is
d1024/14L, trainable data-parallel). For headroom beyond that, this module
makes the provisioned ``model`` mesh axis real: parameters are placed with
Megatron-style PartitionSpecs and GSPMD propagates the activation shardings
and inserts the collectives — no model-code changes:

* attention q/k/v projections: columns (heads) sharded → P(None, 'model');
* attention output projection: rows sharded → P('model', None);
* FFN fc1: columns sharded; fc2: rows sharded;
* embeddings / output heads: vocab dim sharded;
* everything else (norms, biases, conv frontend): replicated.

With ``model=1`` every rule degenerates to replication (pure DP).
Equivalence with the single-device step is asserted in
tests/test_sharding.py on the virtual CPU mesh.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["param_spec_rules", "shard_params", "spec_for_path"]

# (path regex, PartitionSpec factory by param rank)
RULES: List[Tuple[str, Any]] = [
    # attention projections (Dense kernels are (in, out))
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r"(q_proj|k_proj|v_proj)/bias$", P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"pos_proj/kernel$", P(None, "model")),
    # FFN
    (r"ffn/fc1/kernel$", P(None, "model")),
    (r"ffn/fc1/bias$", P("model")),
    (r"ffn/fc2/kernel$", P("model", None)),
    # conformer conv module pointwise projections
    (r"conv/pw1/kernel$", P(None, "model")),
    (r"conv/pw2/kernel$", P("model", None)),
    # embeddings / output heads: shard the vocab dimension
    (r"tgt_embed/embed/embedding$", P("model", None)),
    (r"(seq_lin|ctc_lin).*linear/kernel$", P(None, "model")),
    (r"(seq_lin|ctc_lin).*linear/bias$", P("model")),
]


def spec_for_path(path: str) -> P:
    for pattern, spec in RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        name = getattr(k, "key", None)
        parts.append(str(name if name is not None else k))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a parameter pytree with TP PartitionSpecs over the mesh."""

    def place(key_path, leaf):
        spec = spec_for_path(_path_str(key_path))
        # drop axes the leaf can't support (rank < spec length)
        if hasattr(leaf, "ndim") and leaf.ndim < len(
            [a for a in spec if a is not None] or []
        ):
            spec = P()
        if hasattr(leaf, "ndim") and len(spec) > getattr(leaf, "ndim", 0):
            spec = P(*spec[: leaf.ndim])
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
