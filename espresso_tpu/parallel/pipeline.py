"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Replaces the reference's torch ``Pipe``-based pipeline-parallel transformer
(fairseq/model_parallel/models/pipeline_parallel_transformer/, configured via
--pipeline-model-parallel, configs.py:376-434) with the TPU-native pattern:
identical layer stages hold their parameters sharded on a ``stage`` mesh
axis, and activations flow stage-to-stage with ``jax.lax.ppermute`` inside a
``shard_map``; the classic (M + S - 1)-step schedule keeps every stage busy
once the pipeline fills.

Usage: stack the per-stage parameters on a leading axis (sharded over
``stage``), give a ``stage_fn(stage_params, x) -> x`` that applies one
stage's layers, and call ``gpipe`` with the number of microbatches. ASR
models here are small enough that dp/tp/fsdp usually suffice (SURVEY §2.4);
this utility exists for capability parity and very deep encoders.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def gpipe(
    stage_fn: Callable,
    stage_params,
    x,
    num_microbatches: int,
    mesh: Mesh,
    stage_axis: str = "stage",
    const=None,
) -> jnp.ndarray:
    """Run x through S pipelined stages.

    stage_params: pytree whose leaves have a leading axis of size S
      (sharded over ``stage_axis``).
    x: array or pytree of arrays, all [B, ...] with B divisible by
      num_microbatches (replicated). ``stage_fn(params, payload)`` must
      return a payload with the same structure.
    const: optional replicated pytree handed to every stage_fn call
      (``stage_fn(params, payload, const)``), for per-batch constants such
      as attention masks or positional tables.
    Returns y (replicated) equal to applying the stages in order.
    """
    S = mesh.shape[stage_axis]
    leaves = jax.tree_util.tree_leaves(x)
    B = leaves[0].shape[0]
    M = num_microbatches
    assert B % M == 0, (B, M)
    mb = B // M
    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape(M, mb, *a.shape[1:]), x
    )

    param_specs = jax.tree_util.tree_map(
        lambda _: P(stage_axis), stage_params
    )
    x_specs = jax.tree_util.tree_map(lambda _: P(), x)
    const_specs = jax.tree_util.tree_map(lambda _: P(), const)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, x_specs, const_specs),
        out_specs=P(),
    )
    def run(params_local, x_all, const_rep):
        # params_local leaves: [1, ...] (this stage's slice)
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_local)
        s = jax.lax.axis_index(stage_axis)
        perm_fwd = [(i, i + 1) for i in range(S - 1)]

        def mask_tree(pred, new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(pred, n, o), new, old
            )

        def step(carry, t):
            buf_in, outputs = carry
            mb_idx = t - s
            active = (mb_idx >= 0) & (mb_idx < M)
            # stage 0 reads the microbatch; later stages read the handoff
            mb_t = jax.tree_util.tree_map(
                lambda a: a[jnp.clip(t, 0, M - 1)], x_all
            )
            feed = mask_tree(s == 0, mb_t, buf_in)
            out = (
                stage_fn(params_here, feed)
                if const is None
                else stage_fn(params_here, feed, const_rep)
            )
            zeros = jax.tree_util.tree_map(jnp.zeros_like, out)
            out = mask_tree(active, out, zeros)
            # hand off to the next stage
            buf_next = jax.tree_util.tree_map(
                lambda o: jax.lax.ppermute(o, stage_axis, perm_fwd), out
            )
            # the last stage records finished microbatches
            write_idx = jnp.clip(mb_idx, 0, M - 1)
            take_new = (s == S - 1) & active
            outputs = mask_tree(
                take_new,
                jax.tree_util.tree_map(
                    lambda buf, o: buf.at[write_idx].set(o), outputs, out
                ),
                outputs,
            )
            return (buf_next, outputs), None

        # mark the carries as stage-varying for shard_map's type system
        pvary = lambda tree: jax.tree_util.tree_map(
            lambda a: jax.lax.pvary(jnp.zeros_like(a), (stage_axis,)), tree
        )
        buf0 = pvary(jax.tree_util.tree_map(lambda a: a[0], x_all))
        outputs0 = pvary(x_all)
        (buf, outputs), _ = jax.lax.scan(
            step, (buf0, outputs0), jnp.arange(M + S - 1)
        )
        # outputs are valid only on the last stage; broadcast via psum
        outputs = mask_tree(
            s == S - 1, outputs, jax.tree_util.tree_map(jnp.zeros_like, outputs)
        )
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(o, stage_axis), outputs
        )

    y_mb = run(stage_params, x_mb, const)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(B, *a.shape[2:]), y_mb
    )


def stack_stage_params(per_layer_params: list, layers_per_stage: int):
    """Group a list of identical-structure layer param trees into stacked
    per-stage trees: S stages each applying ``layers_per_stage`` layers.

    Returns a pytree with leaves [S, layers_per_stage, ...].
    """
    S = len(per_layer_params) // layers_per_stage
    assert S * layers_per_stage == len(per_layer_params)
    stages = []
    for si in range(S):
        group = per_layer_params[si * layers_per_stage : (si + 1) * layers_per_stage]
        stages.append(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *group)
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)
