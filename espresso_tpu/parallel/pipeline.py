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
    x: jnp.ndarray,
    num_microbatches: int,
    mesh: Mesh,
    stage_axis: str = "stage",
) -> jnp.ndarray:
    """Run x through S pipelined stages.

    stage_params: pytree whose leaves have a leading axis of size S
      (sharded over ``stage_axis``).
    x: [B, ...] with B divisible by num_microbatches (replicated).
    Returns y: [B, ...] (replicated), equal to applying the stages in order.
    """
    S = mesh.shape[stage_axis]
    B = x.shape[0]
    M = num_microbatches
    assert B % M == 0, (B, M)
    mb = B // M
    x_mb = x.reshape(M, mb, *x.shape[1:])

    param_specs = jax.tree_util.tree_map(
        lambda _: P(stage_axis), stage_params
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
    )
    def run(params_local, x_all):
        # params_local leaves: [1, ...] (this stage's slice)
        params_here = jax.tree_util.tree_map(lambda p: p[0], params_local)
        s = jax.lax.axis_index(stage_axis)
        perm_fwd = [(i, i + 1) for i in range(S - 1)]

        def step(carry, t):
            buf_in, outputs = carry
            mb_idx = t - s
            active = (mb_idx >= 0) & (mb_idx < M)
            # stage 0 reads the microbatch; later stages read the handoff
            feed = jnp.where(
                (s == 0),
                x_all[jnp.clip(t, 0, M - 1)],
                buf_in,
            )
            out = stage_fn(params_here, feed)
            out = jnp.where(active, out, jnp.zeros_like(out))
            # hand off to the next stage
            buf_next = jax.lax.ppermute(out, stage_axis, perm_fwd)
            # the last stage records finished microbatches
            write_idx = jnp.clip(mb_idx, 0, M - 1)
            take_new = (s == S - 1) & active
            outputs = jnp.where(
                take_new, outputs.at[write_idx].set(out), outputs
            )
            return (buf_next, outputs), None

        # mark the carries as stage-varying for shard_map's type system
        buf0 = jax.lax.pvary(jnp.zeros_like(x_all[0]), (stage_axis,))
        outputs0 = jax.lax.pvary(jnp.zeros_like(x_all), (stage_axis,))
        (buf, outputs), _ = jax.lax.scan(
            step, (buf0, outputs0), jnp.arange(M + S - 1)
        )
        # outputs are valid only on the last stage; broadcast via psum
        outputs = jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, stage_axis)

    y_mb = run(stage_params, x_mb)
    return y_mb.reshape(B, *x.shape[1:])


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
