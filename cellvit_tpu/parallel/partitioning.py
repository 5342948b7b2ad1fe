"""Tensor-parallel parameter partitioning rules.

The reference has no model parallelism at all (SURVEY §2.10); this module
adds Megatron-style tensor parallelism over the mesh's `model` axis for the
ViT encoders — useful for SAM-H (~630M params) activation memory at 1024²
tiles and as the scaling path beyond pure DP:

* attention qkv kernel (E, 3C): shard output dim → heads split across the
  axis; proj kernel (C, E): shard input dim (row-parallel, psum by XLA);
* MLP fc1 (E, H): column-parallel; fc2 (H, E): row-parallel;
* everything else (norms, biases, conv decoders) replicated.

Rules are applied as `NamedSharding`s on the param pytree; XLA's sharding
propagation inserts the all-reduces. No model-code changes needed.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _rule_for_path(names: Tuple[str, ...]) -> P:
    """PartitionSpec for one param leaf, by its flax path."""
    if "attn" in names:
        if "qkv" in names and names[-1] == "kernel":
            return P(None, "model")  # column parallel
        if "proj" in names and names[-1] == "kernel":
            return P("model", None)  # row parallel
        if "qkv" in names and names[-1] == "bias":
            return P("model")
    if "mlp" in names:
        if "fc1" in names and names[-1] == "kernel":
            return P(None, "model")
        if "fc1" in names and names[-1] == "bias":
            return P("model")
        if "fc2" in names and names[-1] == "kernel":
            return P("model", None)
    return P()  # replicated


def encoder_tp_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Param pytree → pytree of NamedShardings (TP inside `encoder`,
    replicated elsewhere). Leaves whose sharded dim does not divide the
    model-axis size fall back to replication."""
    n_model = mesh.shape["model"]

    def spec_of(path, leaf) -> NamedSharding:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        spec = P()
        if names and names[0] == "encoder" and n_model > 1:
            spec = _rule_for_path(names)
            # divisibility check per sharded axis
            for axis_idx, axis_name in enumerate(spec):
                if axis_name == "model" and leaf.shape[axis_idx] % n_model != 0:
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def apply_tp_shardings(variables: Dict, mesh: Mesh) -> Dict:
    """Place a variables pytree on the mesh with TP rules on encoder params
    and replication for everything else (batch_stats, other collections)."""
    out = dict(variables)
    shardings = encoder_tp_shardings(variables["params"], mesh)
    out["params"] = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), variables["params"], shardings
    )
    repl = NamedSharding(mesh, P())
    for coll in variables:
        if coll == "params":
            continue
        out[coll] = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), variables[coll]
        )
    return out
