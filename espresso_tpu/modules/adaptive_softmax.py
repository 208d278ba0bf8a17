"""Adaptive softmax output layer and adaptive input embeddings.

Rebuild of fairseq/modules/adaptive_softmax.py and adaptive_input.py
(Grave et al. 2017 "Efficient softmax approximation for GPUs"; Baevski &
Auli 2019 adaptive inputs). Frequent tokens live in a full-dimension head;
rarer tokens are grouped into tail clusters scored through a low-rank
bottleneck (dim / factor^i).

TPU re-design: the reference routes each token to its cluster with
data-dependent index_select (adaptive_softmax.py `remap_target`), which is
hostile to XLA's static shapes. Here every cluster's logits are computed
densely for ALL positions — the low-rank tail projections keep that cheaper
than a full softmax (sum_i d·d/f^i + (d/f^i)·|V_i| << d·|V|) — and the
target's cluster is selected with `jnp.where` masks. Everything stays
batched matmuls on the MXU with zero dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _validate_cutoffs(cutoffs: Sequence[int], vocab_size: int) -> Tuple[int, ...]:
    cut = tuple(int(c) for c in cutoffs)
    assert all(c2 > c1 for c1, c2 in zip(cut, cut[1:])), "cutoffs must increase"
    assert 0 < cut[0] and cut[-1] < vocab_size, (
        f"cutoffs {cut} out of range for vocab {vocab_size}"
    )
    return cut + (vocab_size,)


class AdaptiveSoftmax(nn.Module):
    """Hierarchical output layer.

    ``target_lprobs(features, targets)`` gives the training-time target
    log-probabilities (the only thing the loss needs); ``log_probs`` gives
    the full [*, V] table for decoding/eval (reference
    adaptive_softmax.py ``get_log_prob``).
    """

    vocab_size: int
    input_dim: int
    cutoffs: Tuple[int, ...]  # without the final vocab_size
    factor: float = 4.0
    dropout: float = 0.0

    def setup(self):
        cut = _validate_cutoffs(self.cutoffs, self.vocab_size)
        self._cut = cut
        n_clusters = len(cut) - 1  # number of tail clusters
        # head: top tokens + one slot per tail cluster
        self.head = nn.Dense(
            cut[0] + n_clusters, use_bias=False, name="head"
        )
        tails = []
        for i in range(n_clusters):
            proj_dim = max(1, int(self.input_dim // (self.factor ** (i + 1))))
            tails.append(
                (
                    nn.Dense(proj_dim, use_bias=False, name=f"tail{i}_proj"),
                    nn.Dense(
                        cut[i + 1] - cut[i], use_bias=False, name=f"tail{i}_out"
                    ),
                )
            )
        self.tails = tails
        self.drop = nn.Dropout(rate=self.dropout)

    def _head_lprobs(self, x, train):
        if self.dropout > 0.0 and train:
            x = self.drop(x, deterministic=False)
        return jax.nn.log_softmax(
            self.head(x).astype(jnp.float32), axis=-1
        )

    def _tail_lprobs(self, x, i, train):
        proj, out = self.tails[i]
        h = proj(x)
        if self.dropout > 0.0 and train:
            h = self.drop(h, deterministic=False)
        return jax.nn.log_softmax(out(h).astype(jnp.float32), axis=-1)

    def target_lprobs(
        self, x: jnp.ndarray, targets: jnp.ndarray, train: bool = False
    ) -> jnp.ndarray:
        """x: [..., d]; targets: [...] int. Returns target log-prob [...]."""
        cut = self._cut
        head_lp = self._head_lprobs(x, train)
        in_head = targets < cut[0]
        lp = jnp.take_along_axis(
            head_lp,
            jnp.where(in_head, targets, 0)[..., None],
            axis=-1,
        )[..., 0]
        lp = jnp.where(in_head, lp, 0.0)
        for i in range(len(cut) - 1):
            lo, hi = cut[i], cut[i + 1]
            in_cluster = (targets >= lo) & (targets < hi)
            local = jnp.clip(targets - lo, 0, hi - lo - 1)
            tail_lp = self._tail_lprobs(x, i, train)
            cluster_lp = head_lp[..., cut[0] + i] + jnp.take_along_axis(
                tail_lp, local[..., None], axis=-1
            )[..., 0]
            lp = jnp.where(in_cluster, cluster_lp, lp)
        return lp

    def log_probs(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Full [..., V] log-probability table (decode/eval path)."""
        cut = self._cut
        head_lp = self._head_lprobs(x, train)
        pieces = [head_lp[..., : cut[0]]]
        for i in range(len(cut) - 1):
            tail_lp = self._tail_lprobs(x, i, train)
            pieces.append(head_lp[..., cut[0] + i, None] + tail_lp)
        return jnp.concatenate(pieces, axis=-1)


class AdaptiveInput(nn.Module):
    """Adaptive input embeddings (fairseq/modules/adaptive_input.py):
    frequent tokens get full-dim embeddings, rare clusters get
    dim/factor^i embeddings projected up to ``output_dim``. Cluster
    membership is selected with masks over densely-computed per-cluster
    lookups (clusters are few; each lookup is one gather + one matmul)."""

    vocab_size: int
    output_dim: int
    cutoffs: Tuple[int, ...]
    factor: float = 4.0

    def setup(self):
        cut = _validate_cutoffs(self.cutoffs, self.vocab_size)
        self._cut = cut
        embeds = []
        projs = []
        prev = 0
        for i, hi in enumerate(cut):
            dim = max(1, int(self.output_dim // (self.factor ** i)))
            embeds.append(nn.Embed(hi - prev, dim, name=f"embed{i}"))
            projs.append(
                nn.Dense(self.output_dim, use_bias=False, name=f"proj{i}")
            )
            prev = hi
        self.embeds = embeds
        self.projs = projs

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cut = self._cut
        out = jnp.zeros(tokens.shape + (self.output_dim,), jnp.float32)
        prev = 0
        for i, hi in enumerate(cut):
            in_cluster = (tokens >= prev) & (tokens < hi)
            local = jnp.clip(tokens - prev, 0, hi - prev - 1)
            emb = self.projs[i](self.embeds[i](local))
            out = jnp.where(in_cluster[..., None], emb, out)
            prev = hi
        return out
