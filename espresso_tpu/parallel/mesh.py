"""Device mesh construction and parameter sharding rules.

TPU-native replacement for the reference's whole distributed stack
(fairseq/distributed/: NCCL init, DDP wrappers, fairscale FSDP/OSS, Megatron
MPU — SURVEY.md §2.4): one ``jax.sharding.Mesh`` with axes ``(data, model)``;
XLA inserts all collectives over ICI/DCN.

  * **DP** (reference pytorch_ddp/legacy_ddp): batch sharded on ``data``,
    params replicated. Gradient psum is inserted by XLA — no allreduce code.
  * **FSDP / ZeRO** (reference fully_sharded + zero_sharding=os): params and
    optimizer state sharded on ``data`` along each array's largest divisible
    axis; XLA all-gathers weights per layer on use.
  * **TP** (reference Megatron model_parallel/): regex rules shard attention
    QKV/out and FFN kernels on ``model`` in the Megatron column/row layout.

Multi-host: call ``jax.distributed.initialize`` (coordinator address from
config) before mesh construction; per-host data loading uses shard_id =
process_index (the reference's --num-shards/--shard-id semantics).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data_parallel_size: int = -1,
    model_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = model_parallel_size * pipeline_parallel_size
    if data_parallel_size == -1:
        assert n % mp == 0, (n, model_parallel_size, pipeline_parallel_size)
        data_parallel_size = n // mp
    want = data_parallel_size * mp
    assert want <= n, (
        f"mesh {data_parallel_size}x{model_parallel_size}"
        f"x{pipeline_parallel_size} needs {want} devices, have {n}"
    )
    devices = devices[:want]  # explicit sizes may use a device subset
    arr = np.asarray(devices).reshape(
        data_parallel_size, model_parallel_size, pipeline_parallel_size
    )
    mesh = Mesh(arr, axis_names=("data", "model", "stage"))
    set_global_mesh(mesh)
    return mesh


_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]) -> None:
    """Register the session mesh so model internals (e.g. the pipelined
    encoder's shard_map) can reach it without threading it through configs."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Mesh:
    if _GLOBAL_MESH is None:
        raise RuntimeError("no global mesh set; call make_mesh first")
    return _GLOBAL_MESH


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, has_microbatch_axis: bool = False) -> NamedSharding:
    """Shard the batch dim on 'data' (axis 0, or axis 1 under grad-accum)."""
    if has_microbatch_axis:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


# Megatron-style TP rules: (path regex, PartitionSpec) — first match wins.
# Dense kernels are [in, out]: column-parallel shards out, row-parallel in.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*out_proj/kernel$", P("model", None)),
    (r".*(fc1|ffn1/Dense_0|ffn2/Dense_0)/kernel$", P(None, "model")),
    (r".*(fc2|ffn1/Dense_1|ffn2/Dense_1)/kernel$", P("model", None)),
    (r".*embed_tokens/embedding$", P("model", None)),
    # vocab-parallel output projection (Megatron vocab-parallel CE,
    # reference fairseq/model_parallel/criterions/vocab_parallel_cross_entropy.py
    # + modules/: every model's output head here is named fc_out): the
    # kernel is column-parallel over the vocab dim, so logits come out
    # [B, T, V/model]-sharded and the criterion's log_softmax reduction
    # over V becomes a GSPMD-inserted collective — no hand-written
    # parallel CE needed, which is exactly the TPU-native form of the
    # reference's custom kernel. Verified in the dp4xtp2 dryrun
    # (__graft_entry__.dryrun_multichip).
    #
    # The transducer JOINT's fc_out is deliberately excluded: its
    # kernel/bias feed the fused Pallas RNNT loss on TPU
    # (criterions.py -> ops/rnnt_pallas), and Pallas custom calls have no
    # GSPMD partitioning rule for sharded operands — the joint head stays
    # replicated (ASR joint vocabs are 1k-10k; the memory cost is small).
    (r"(?!.*joint).*fc_out/kernel$", P(None, "model")),
    (r"(?!.*joint).*fc_out/bias$", P("model")),
    # BASE MoE layers: expert-parallelism = leading expert axis over 'model'
    # (the routing gather/scatter becomes an XLA all-to-all under GSPMD)
    (r".*base\d+/expert_centroids$", P("model", None)),
    (r".*base\d+/(ff1_kernel|ff2_kernel|ff1_bias|ff2_bias|ln_scale|ln_bias)_\d+$", P("model")),
)


def _fsdp_spec(path: str, shape: Tuple[int, ...], data_size: int) -> P:
    """Shard the largest divisible axis on 'data' (simple FSDP rule)."""
    if not shape or max(shape) < 2 * data_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % data_size == 0:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def partition_params(
    params: Any,
    mesh: Mesh,
    fsdp: bool = False,
    tensor_parallel: bool = False,
    pipeline: bool = False,
) -> Any:
    """Return a NamedSharding pytree matching ``params``."""
    data_size = mesh.shape["data"]
    model_size = mesh.shape["model"]
    stage_size = mesh.shape.get("stage", 1)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = P()
        if (
            pipeline
            and stage_size > 1
            and "pipe_layers" in path_str
            and leaf.shape
            and leaf.shape[0] % stage_size == 0
        ):
            # stacked encoder layers: leading layer axis over 'stage'
            shardings.append(NamedSharding(mesh, P("stage")))
            continue
        if tensor_parallel and model_size > 1:
            for pattern, tp_spec in TP_RULES:
                if re.match(pattern, path_str):
                    # only apply if divisible
                    ok = True
                    for dim, ax in zip(leaf.shape, tp_spec):
                        if ax == "model" and dim % model_size != 0:
                            ok = False
                    if ok:
                        spec = tp_spec
                    break
        if fsdp and spec == P():
            spec = _fsdp_spec(path_str, leaf.shape, data_size)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: int = 1,
    process_id: int = 0,
) -> None:
    """Multi-host bring-up (replaces reference distributed_init,
    fairseq/distributed/utils.py:239): one process per host, TPU runtime owns
    local devices."""
    if coordinator_address and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
