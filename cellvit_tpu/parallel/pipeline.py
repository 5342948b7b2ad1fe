"""Pipeline parallelism for the histo ViT encoder (GPipe-style inference).

New capability vs the reference (which is single-process single-GPU,
SURVEY §2.10): the encoder's transformer blocks are staged over a `pipe`
mesh axis, and microbatches circulate stage-to-stage with
`jax.lax.ppermute` inside one `shard_map` — the TPU-native schedule
(compute and ICI transfers overlap across microbatches; no host
involvement). Complements DP (`data` axis), TP
(`parallel/partitioning.py`) and SP (`seq_sharding`) as the fourth
scaling axis.

Design notes:

* The HistoViT blocks are homogeneous (`models/vit.py:Block`), so one
  stage applies its `depth // n_stages` blocks with a `lax.scan` over
  stacked per-block params — a single compiled block body per stage.
* CellViT's skip extraction (`extract_layers`, reference
  `models/segmentation/cell_segmentation/utils.py:149-174`) reads the
  token sequence after blocks 1·L, 2·L, … — for every shipped config the
  extraction points are uniform (e.g. 3/6/9/12 at depth 12), so each
  stage BOUNDARY is a skip tensor: the activations already flowing
  between stages are the values the decoder needs. The helper asserts
  `extract_layers` ⊆ stage boundaries and returns all boundary tensors
  via one all-gather at the end.
* Inference-only (`train=False`): drop-path and dropout are inactive, so
  per-block drop-path rates do not break stage homogeneity. Training-time
  PP (1F1B with stashed activations) is out of scope — CellViT training
  fits one chip (reference trains at 256²).
* The GPipe bubble is the usual (S−1)/(M+S−1) fraction; choose
  `n_micro ≥ n_stages` to amortize.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from cellvit_tpu.models.vit import Block, HistoViT


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ("pipe",) mesh over `n_stages` devices."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_stages, (len(devices), n_stages)
    return Mesh(np.array(devices[:n_stages]), axis_names=("pipe",))


def stack_block_params(encoder_params: Dict, depth: int):
    """blocks_0 … blocks_{depth-1} param trees → one tree with a leading
    `depth` axis on every leaf (scan-ready)."""
    blocks = [encoder_params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_encoder_apply(
    enc: HistoViT,
    variables: Dict,
    x: jax.Array,
    mesh: Mesh,
    n_micro: int,
) -> Tuple[jax.Array, jax.Array, List[jax.Array]]:
    """HistoViT forward with the blocks pipelined over mesh axis "pipe".

    Returns `(logits, cls_token, skips)` exactly like `HistoViT.__call__`
    with `train=False`. Requirements: `depth % n_stages == 0`,
    `batch % n_micro == 0`, and every entry of `enc.extract_layers` a
    multiple of `depth // n_stages` (stage boundaries — holds for all
    shipped configs).
    """
    from jax import shard_map

    n_stages = mesh.shape["pipe"]
    depth = enc.depth
    assert depth % n_stages == 0, (depth, n_stages)
    per_stage = depth // n_stages
    bad = [e for e in enc.extract_layers if e % per_stage != 0]
    assert not bad, (
        f"extract_layers {bad} are not stage boundaries "
        f"(stage length {per_stage}); choose n_stages so they divide"
    )

    params = variables["params"]
    tokens = enc.apply(
        variables, x, train=False, method=HistoViT.prepare_tokens
    )
    b, n, c = tokens.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    micro = tokens.reshape(n_micro, mb, n, c)

    stacked = stack_block_params(params, depth)
    # (depth, ...) → (n_stages, per_stage, ...): device s holds stage s
    stacked = jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, per_stage) + a.shape[1:]), stacked
    )

    block = Block(
        enc.embed_dim,
        enc.num_heads,
        mlp_ratio=enc.mlp_ratio,
        qkv_bias=enc.qkv_bias,
        dtype=enc.dtype,
    )

    def apply_stage(stage_params, tok):
        def body(t, p):
            return block.apply({"params": p}, t, False), None

        tok, _ = jax.lax.scan(body, tok, stage_params)
        return tok

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pipelined(stage_params, micro):
        # shard_map body: stage_params leaves (1, per_stage, ...) — my
        # stage; micro (n_micro, mb, n, c) — replicated.
        stage_params = jax.tree_util.tree_map(
            lambda a: a[0], stage_params
        )
        idx = jax.lax.axis_index("pipe")

        def step(t, carry):
            state, outs = carry
            mb_id = t - idx  # microbatch this stage works on at tick t
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            inp = jnp.where(idx == 0, feed, state)
            out = apply_stage(stage_params, inp)
            # record my stage's output for microbatch mb_id (if valid)
            valid = jnp.logical_and(mb_id >= 0, mb_id < n_micro)
            slot = jnp.clip(mb_id, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, out, cur), slot, 0
            )
            state = jax.lax.ppermute(out, "pipe", perm)
            return state, outs

        # initial carries must be marked device-varying over "pipe" to
        # match the loop outputs (which depend on axis_index/ppermute)
        vary = lambda a: jax.lax.pcast(a, ("pipe",), to="varying")
        outs0 = vary(jnp.zeros((n_micro, mb, n, c), tokens.dtype))
        state0 = vary(jnp.zeros((mb, n, c), tokens.dtype))
        _, outs = jax.lax.fori_loop(
            0, n_micro + n_stages - 1, step, (state0, outs0)
        )
        return outs[None]  # (1, n_micro, mb, n, c) — gathered over "pipe"

    boundaries = shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(P("pipe"), P()),
        out_specs=P("pipe"),
    )(stacked, micro)
    # (n_stages, n_micro, mb, n, c) → per-boundary (b, n, c)
    boundaries = boundaries.reshape(n_stages, b, n, c)

    skips = [
        boundaries[e // per_stage - 1] for e in enc.extract_layers
    ]
    final = boundaries[-1]
    normed = nn.LayerNorm(epsilon=1e-6, dtype=enc.dtype).apply(
        {"params": params["norm"]}, final
    )
    cls_token = normed[:, 0]
    if "head" in params:
        logits = nn.Dense(
            params["head"]["kernel"].shape[-1], dtype=enc.dtype
        ).apply({"params": params["head"]}, cls_token)
    else:
        logits = cls_token
    return logits, cls_token, skips
