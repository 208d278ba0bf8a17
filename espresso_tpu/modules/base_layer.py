"""BASE layer: sparse mixture-of-experts with balanced routing.

Rebuild of fairseq/modules/base_layer.py (BaseLayer/BaseSublayer; "BASE
Layers: Simplifying Training of Large, Sparse Models", Lewis et al. 2021):
each token is routed to exactly one expert FFN; during training the
balanced-assignment auction (ops/assignment.py, the libbase replacement)
gives every expert exactly tokens/num_experts tokens — which on TPU doubles
as the static-shape guarantee. The expert output is mixed with the input
through a sigmoid gate on the token·centroid affinity (the only path that
trains the centroids, as in the reference).

TPU-native design differences from the reference:
- experts live as a stacked [E, ...] parameter tree in ONE program instead
  of one-expert-per-rank modules; expert parallelism = sharding the E axis
  over the mesh's model axis, and the routing gather/scatter becomes XLA
  all-to-all under GSPMD instead of torch.distributed.all_to_all.
- inference greedy routing keeps static shapes via a capacity bound
  (overflow tokens take the residual path; reference base_layer.py:96-110
  uses dynamic splits instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from espresso_tpu.ops.assignment import balanced_assignment, greedy_assignment


class BaseLayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_experts: int
    sublayers: int = 1  # reference --base-sublayers
    shuffle: bool = True  # reference --base-shuffle
    eval_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, T, D] (or [N, D]) -> same shape."""
        E, D, F = self.num_experts, self.embed_dim, self.ffn_dim
        orig_shape = x.shape
        tokens = x.reshape(-1, D)
        N = tokens.shape[0]
        pad = (-N) % E
        if pad:
            tokens = jnp.concatenate([tokens, jnp.zeros((pad, D), x.dtype)], 0)
        Np = tokens.shape[0]

        centroids = self.param(
            "expert_centroids",
            lambda key, shape: 0.1 * jax.nn.initializers.orthogonal()(key, shape),
            (E, D),
        ).astype(jnp.float32)

        if self.shuffle and train:
            # break within-batch correlations (reference base_layer.py:38-41)
            perm = jax.random.permutation(self.make_rng("dropout"), Np)
            tokens = tokens[perm]

        affinity = jax.lax.stop_gradient(
            tokens.astype(jnp.float32) @ centroids.T
        )  # [Np, E] routing only — not a gradient path (reference no_grad)

        if train:
            assign = balanced_assignment(affinity)  # [Np], exactly C each
            kept = jnp.ones(Np, bool)
            C = Np // E
        else:
            C = max(int(Np // E * self.eval_capacity_factor), 1)
            assign, kept = greedy_assignment(affinity, C)

        # stable sort by expert; each expert's tokens land in its slot range
        order = jnp.argsort(
            jnp.where(kept, assign, E).astype(jnp.int32), stable=True
        )
        if train:
            routed = tokens[order].reshape(E, C, D)  # [E, C, D]
        else:
            # eval: experts own variable counts <= C; scatter into padded slots
            pos_in_expert = _rank_within_group(assign, kept, E)  # [Np]
            slot = jnp.where(kept, assign * C + pos_in_expert, E * C)
            routed = (
                jnp.zeros((E * C + 1, D), tokens.dtype).at[slot].set(tokens)
            )[: E * C].reshape(E, C, D)

        # per-expert residual FFN sublayers (BaseSublayer: x + ff2(act(ff1(LN x)))
        # with ff2 zero-init), stacked on the expert axis
        h = routed
        for i in range(self.sublayers):
            ln_scale = self.param(f"ln_scale_{i}", nn.initializers.ones, (E, D))
            ln_bias = self.param(f"ln_bias_{i}", nn.initializers.zeros, (E, D))
            w1 = self.param(
                f"ff1_kernel_{i}",
                nn.initializers.lecun_normal(),
                (E, D, F),
            )
            b1 = self.param(f"ff1_bias_{i}", nn.initializers.zeros, (E, F))
            w2 = self.param(f"ff2_kernel_{i}", nn.initializers.zeros, (E, F, D))
            b2 = self.param(f"ff2_bias_{i}", nn.initializers.zeros, (E, D))
            y = _layer_norm(h, ln_scale, ln_bias)
            y = jnp.einsum("ecd,edf->ecf", y, w1.astype(h.dtype)) + b1[
                :, None, :
            ].astype(h.dtype)
            y = jax.nn.relu(y)
            y = jnp.einsum("ecf,efd->ecd", y, w2.astype(h.dtype)) + b2[
                :, None, :
            ].astype(h.dtype)
            h = h + y

        # sigmoid gate on the expert's own centroid — the centroid grad path
        alpha = jax.nn.sigmoid(
            jnp.einsum("ecd,ed->ec", routed.astype(jnp.float32), centroids)
        ).astype(h.dtype)[..., None]
        mixed = alpha * h + (1.0 - alpha) * routed  # [E, C, D]

        flat = mixed.reshape(E * C, D)
        if train:
            out = jnp.zeros_like(tokens).at[order].set(flat)
        else:
            gathered = jnp.concatenate(
                [flat, jnp.zeros((1, D), flat.dtype)], 0
            )[jnp.where(kept, assign * C + _rank_within_group(assign, kept, E), E * C)]
            out = jnp.where(kept[:, None], gathered, tokens)

        if self.shuffle and train:
            out = jnp.zeros_like(out).at[perm].set(out)
        return out[:N].reshape(orig_shape)


def _rank_within_group(assign: jnp.ndarray, kept: jnp.ndarray, E: int):
    """Position of each token within its expert's token list (stable)."""
    key = jnp.where(kept, assign, E).astype(jnp.int32)
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    # position within segment = sorted index - first sorted index of the key
    first_idx = (
        jnp.full(E + 1, assign.shape[0], jnp.int32)
        .at[sorted_key]
        .min(jnp.arange(assign.shape[0], dtype=jnp.int32))
    )
    pos_sorted = jnp.arange(assign.shape[0], dtype=jnp.int32) - first_idx[sorted_key]
    return jnp.zeros_like(pos_sorted).at[order].set(pos_sorted)


def _layer_norm(x, scale, bias, eps=1e-5):
    """Per-expert LayerNorm: x [E, C, D], scale/bias [E, D]."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale[:, None, :] + bias[:, None, :]).astype(x.dtype)
