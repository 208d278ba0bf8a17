"""Balanced token→expert assignment for BASE layers, on device.

TPU-native replacement for ``fairseq.libbase``
(fairseq/clib/libbase/balanced_assignment.cpp — the Bertsekas auction
algorithm, adapted so each of E experts takes exactly T/E tokens). The
auction runs as a ``lax.while_loop`` whose body is fully vectorized
(top-k bids per expert, scatter, argmax winner per token), so the whole
routing step stays inside the jitted train program — no host round-trip
the way the reference's C++ extension implies.

The auction terminates when every token receives exactly one bid (E·C bids
over T=E·C tokens with full coverage ⇒ a perfect balanced matching). If the
iteration cap is hit first, a static-shape round-robin repair assigns any
leftover tokens to experts with free capacity so the output is ALWAYS
exactly balanced (the repair preserves static shapes: no dynamic counts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


def balanced_assignment(scores: jnp.ndarray, max_iters: int = 100) -> jnp.ndarray:
    """scores: [T, E] token-to-expert affinities, T divisible by E.
    Returns token→expert assignment [T] int32 where each expert receives
    exactly T/E tokens, (near-)maximizing the total affinity."""
    T, E = scores.shape
    assert T % E == 0, f"tokens ({T}) must be divisible by experts ({E})"
    C = T // E
    scores = scores.astype(jnp.float32)
    eps = jnp.maximum((scores.max() - scores.min()) / 50.0, 1e-4)
    sT = scores.T  # [E, T] expert-major view

    def cond(state):
        it, cost, done, assign = state
        return (~done) & (it < max_iters)

    def body(state):
        it, cost, done, assign = state
        value = sT - cost[None, :]  # [E, T]
        top_vals, top_idx = jax.lax.top_k(value, C + 1)  # [E, C+1]
        incr = top_vals[:, :C] - top_vals[:, C:] + eps  # [E, C] bid increments
        bids = (
            jnp.zeros((E, T))
            .at[jnp.arange(E)[:, None], top_idx[:, :C]]
            .max(incr)
        )
        have_bid = (bids > 0).any(axis=0)  # [T]
        winner = jnp.argmax(bids, axis=0)  # [T]
        high_bid = jnp.max(bids, axis=0)
        new_cost = cost + jnp.where(have_bid, high_bid, 0.0)
        new_assign = jnp.where(have_bid, winner, assign)
        # E·C total bids over T tokens: full coverage <=> exactly one bid
        # per token <=> the experts' top-C sets partition the tokens
        return it + 1, new_cost, have_bid.all(), new_assign

    _, _, done, assign = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), jnp.zeros(T), jnp.bool_(False), jnp.zeros(T, jnp.int32)),
    )
    return jnp.where(done, assign, _repair(scores, assign, C))


def _repair(scores: jnp.ndarray, assign: jnp.ndarray, C: int) -> jnp.ndarray:
    """Enforce exact capacity with static shapes: each over-subscribed expert
    keeps its top-C claimed tokens by score; remaining tokens fill the free
    slots in expert order (round-robin, score-blind — only reached when the
    auction failed to converge)."""
    T, E = scores.shape
    onehot = jax.nn.one_hot(assign, E, dtype=jnp.float32)  # [T, E]
    claimed = scores * onehot + NEG_INF * (1.0 - onehot)
    order = jnp.argsort(-claimed, axis=0)  # [T, E] tokens ranked per expert
    rank = jnp.zeros((T, E), jnp.int32).at[
        order, jnp.arange(E)[None, :]
    ].set(jnp.broadcast_to(jnp.arange(T)[:, None], (T, E)))
    keep = (rank < C) & (onehot > 0)  # [T, E]
    kept_expert = jnp.argmax(keep, axis=1)
    is_kept = keep.any(axis=1)
    # free slots: expert e has C - kept_e free; build the flat slot list
    kept_per_expert = keep.sum(axis=0)  # [E]
    slot_expert = jnp.repeat(jnp.arange(E), C)  # [T] slots in expert order
    slot_rank = jnp.arange(T) % C
    slot_free = slot_rank >= kept_per_expert[slot_expert]  # [T]
    # i-th unassigned token -> i-th free slot (counts match: T - kept each)
    free_order = jnp.argsort(~slot_free, stable=True)  # free slots first
    free_experts_packed = slot_expert[free_order].astype(jnp.int32)  # [T]
    token_pos = jnp.cumsum(~is_kept) - 1
    fill = free_experts_packed[jnp.clip(token_pos, 0, T - 1)]
    return jnp.where(is_kept, kept_expert.astype(jnp.int32), fill)


def greedy_assignment(
    scores: jnp.ndarray, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inference-time routing (reference greedy_assignment,
    base_layer.py:96-110): each token goes to its argmax expert, but on TPU
    shapes must be static, so each expert takes at most ``capacity`` tokens
    (by affinity rank); overflow tokens are marked dropped and pass through
    the residual path. Returns (assign [T], kept [T] bool)."""
    T, E = scores.shape
    best = jnp.argmax(scores, axis=1)  # [T]
    onehot = jax.nn.one_hot(best, E, dtype=jnp.float32)
    claimed = scores * onehot + NEG_INF * (1.0 - onehot)
    order = jnp.argsort(-claimed, axis=0)
    rank = jnp.zeros((T, E), jnp.int32).at[
        order, jnp.arange(E)[None, :]
    ].set(jnp.broadcast_to(jnp.arange(T)[:, None], (T, E)))
    kept = ((rank < capacity) & (onehot > 0)).any(axis=1)
    return best.astype(jnp.int32), kept
