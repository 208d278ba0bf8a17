"""Multi-head attention with optional relative positions and functional cache.

Rebuild of fairseq/modules/multihead_attention.py (1044 LoC) reduced to the
TPU-relevant surface: batched SDPA lowered to MXU matmuls, espnet-style
relative-position scoring with content/position biases (the conformer path,
fairseq/modules/espnet_multihead_attention.py), additive attention masks
(chunk streaming / causal), and an *explicit* decode cache pytree — flax
mutable collections don't compose with ``lax.while_loop`` beam search, so the
cache is passed in and returned functionally.

Cache layout: {"k": [B, S_max, H, Dh], "v": [B, S_max, H, Dh]} written at
``index`` via dynamic_update_slice; the beam-search reorder is then one gather
over the leading batch axis (reference reorder_incremental_state,
sequence_generator.py:357-374, becomes jnp.take).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from espresso_tpu.ops.masking import NEG_INF


def _gather_p_shift(p: jnp.ndarray, Tq: int, Tk: int) -> jnp.ndarray:
    """p [2L-1, H, d] -> p_shift [Tq, Tk, H, d] with
    p_shift[q, k] = p[clip(k - q + L - 1)] (espnet rel-pos convention)."""
    L = (p.shape[0] + 1) // 2
    qi = jnp.arange(Tq)[:, None]
    kj = jnp.arange(Tk)[None, :]
    idx = jnp.clip((L - 1) + (kj - qi), 0, p.shape[0] - 1)
    return jnp.take(p, idx.reshape(-1), axis=0).reshape(
        Tq, Tk, p.shape[1], p.shape[2]
    )


@jax.custom_vjp
def _rel_bd(q_v: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """bd[b,h,q,k] = q_v[b,q,h,:] . p[k-q+L-1,h,:] for the square self-attn
    case (Tq == Tk == L, table rows == 2L-1).

    Forward: row gather of the projected table + one batched matmul — much
    cheaper than the classic pad/reshape/slice skew (which materializes
    four [B,H,T,2L-1] tensors per layer; measured -18% encoder wall at the
    flagship decode shape). Backward avoids the gather's scatter-add
    adjoint (which doubled the train step): contract the batch first, then
    diagonal-sum with a masked pad/reshape — no scatter anywhere.
    """
    T = q_v.shape[1]
    # the inverse skew in _rel_bd_bwd is only valid for the square case
    # (table rows == 2T-1); a non-square call would produce silently wrong
    # dp grads while the forward still worked
    assert T == (p.shape[0] + 1) // 2, (T, p.shape)
    return jnp.einsum("bqhd,qkhd->bhqk", q_v, _gather_p_shift(p, T, T))


def _rel_bd_fwd(q_v, p):
    return _rel_bd(q_v, p), (q_v, p)


def _rel_bd_bwd(res, dbd):
    q_v, p = res
    T = q_v.shape[1]
    L = (p.shape[0] + 1) // 2
    assert T == L, (T, p.shape)  # inverse skew assumes Tq == Tk == L
    # dq_v: contract dbd with the (re-gathered) shifted table
    p_shift = _gather_p_shift(p, T, T)
    dq_v = jnp.einsum("bhqk,qkhd->bqhd", dbd, p_shift).astype(q_v.dtype)
    # dp[o,h,d] = sum_{q,k: k-q+L-1=o, b} dbd[b,h,q,k] q_v[b,q,h,d]:
    # contract b first (the heavy matmul), then sum G's (q,k) diagonals
    # into offsets o via the inverse skew: a masked pad/reshape, no scatter
    G = jnp.einsum("bhqk,bqhd->qkhd", dbd, q_v)  # [T, T, H, d]
    H, d = G.shape[2], G.shape[3]
    # w[q, j] = G[q, j-(L-1)]; want y[q, o] = w[q, o+q] = G[q, o+q-(L-1)]
    w = jnp.pad(G, ((0, 0), (L - 1, 1), (0, 0), (0, 0)))  # [T, 2L, H, d]
    flat = w.reshape(T * 2 * L, H, d)
    flat = jnp.pad(flat, ((0, T), (0, 0), (0, 0)))
    y = flat[: T * (2 * L + 1)].reshape(T, 2 * L + 1, H, d)[:, : 2 * L - 1]
    # zero the positions whose k = o+q-(L-1) fell outside [0, T): the flat
    # reshape reads neighboring rows' data there
    qi = jnp.arange(T)[:, None]
    oi = jnp.arange(2 * L - 1)[None, :]
    kk = oi + qi - (L - 1)
    mask = ((kk >= 0) & (kk < T))[:, :, None, None]
    dp = jnp.sum(jnp.where(mask, y, 0.0), axis=0).astype(p.dtype)
    return dq_v, dp


_rel_bd.defvjp(_rel_bd_fwd, _rel_bd_bwd)


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_relative_pos: bool = False
    use_rotary: bool = False

    def setup(self):
        assert self.embed_dim % self.num_heads == 0
        self.head_dim = self.embed_dim // self.num_heads
        dense = lambda name: nn.Dense(self.embed_dim, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.dropout_layer = nn.Dropout(rate=self.dropout)
        if self.use_relative_pos:
            self.pos_proj = nn.Dense(self.embed_dim, use_bias=False, name="pos_proj")
            self.pos_bias_u = self.param(
                "pos_bias_u",
                nn.initializers.zeros,
                (self.num_heads, self.head_dim),
            )
            self.pos_bias_v = self.param(
                "pos_bias_v",
                nn.initializers.zeros,
                (self.num_heads, self.head_dim),
            )

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        B, L, _ = x.shape
        return x.reshape(B, L, self.num_heads, self.head_dim)

    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, D]
        key: jnp.ndarray,  # [B, Tk, D]
        value: jnp.ndarray,  # [B, Tk, D]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Tk] True=valid
        attn_mask: Optional[jnp.ndarray] = None,  # additive [Tq, Tk] or [B, Tq, Tk]
        rel_pos: Optional[jnp.ndarray] = None,  # [2L-1, D] table
        deterministic: bool = True,
        cache: Optional[Dict[str, Any]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        need_weights: bool = False,
    ):
        """Returns (out [B, Tq, D], attn_weights or None, new_cache or None)."""
        if self.use_rotary:
            from espresso_tpu.modules.positional import (
                apply_rotary,
                rotary_inv_freq,
            )

            inv_freq = rotary_inv_freq(self.head_dim)
        q = self._split(self.q_proj(query))
        new_cache = None
        if cache is not None and "k" in cache and key is query:
            # incremental self-attention: append this step's k/v.
            # cache_index may be a scalar (lockstep decode) or a [B] vector
            # (per-row positions — transducer AES beams advance the fusion
            # LM different numbers of steps per frame)
            k_new = self._split(self.k_proj(key))
            v_new = self._split(self.v_proj(value))
            per_row = (
                hasattr(cache_index, "ndim") and cache_index.ndim == 1
            )
            if per_row:
                # the per-row path appends exactly ONE step per call
                assert q.shape[1] == 1, (
                    "per-row cache_index requires single-step queries"
                )
            if self.use_rotary:
                if per_row:
                    from espresso_tpu.modules.positional import (
                        apply_rotary_single_step,
                    )

                    q = apply_rotary_single_step(q, cache_index, inv_freq)
                    k_new = apply_rotary_single_step(
                        k_new, cache_index, inv_freq
                    )
                else:
                    pos = jnp.asarray(cache_index).reshape(1)
                    q = apply_rotary(q, pos, inv_freq)
                    k_new = apply_rotary(k_new, pos, inv_freq)
            if per_row:
                B_ = q.shape[0]
                rows = jnp.arange(B_)
                k_all = cache["k"].at[rows, cache_index].set(
                    k_new[:, 0].astype(cache["k"].dtype)
                )
                v_all = cache["v"].at[rows, cache_index].set(
                    v_new[:, 0].astype(cache["v"].dtype)
                )
                S = k_all.shape[1]
                step_mask = (
                    jnp.arange(S)[None, :] <= cache_index[:, None]
                )
            else:
                k_all = jax.lax.dynamic_update_slice(
                    cache["k"],
                    k_new.astype(cache["k"].dtype),
                    (0, cache_index, 0, 0),
                )
                v_all = jax.lax.dynamic_update_slice(
                    cache["v"],
                    v_new.astype(cache["v"].dtype),
                    (0, cache_index, 0, 0),
                )
                S = k_all.shape[1]
                step_mask = jnp.broadcast_to(
                    jnp.arange(S)[None, :] <= cache_index, (q.shape[0], S)
                )
            new_cache = {"k": k_all, "v": v_all}
            k, v = k_all, v_all
            if key_padding_mask is None:
                key_padding_mask = step_mask
            else:
                key_padding_mask = key_padding_mask & step_mask
        elif cache is not None and "k_static" in cache:
            # cross-attention with precomputed encoder k/v
            k, v = cache["k_static"], cache["v_static"]
            new_cache = cache
        else:
            k = self._split(self.k_proj(key))
            v = self._split(self.v_proj(value))
            if self.use_rotary:
                q = apply_rotary(q, jnp.arange(q.shape[1]), inv_freq)
                k = apply_rotary(k, jnp.arange(k.shape[1]), inv_freq)

        scale = self.head_dim ** -0.5
        if self.use_relative_pos and rel_pos is not None:
            p_flat = self.pos_proj(rel_pos)  # [2L-1, D]
            Tq_, Tk_ = q.shape[1], k.shape[1]
            L_ = (p_flat.shape[0] + 1) // 2
            # default-on for TPU inference since the round-4 on-chip A/B:
            # flagship decode encoder (B=256, T'=156, 16 layers) 340.8 ->
            # 284.3 ms/call (-16.6%), output drift at bf16 rounding scale
            # (max abs 0.078 after 16 layers). ESPRESSO_FUSED_ATTN=off
            # restores the jnp path; =interpret for CPU parity tests.
            fused_mode = os.environ.get("ESPRESSO_FUSED_ATTN", "auto")
            if (
                fused_mode != "off"
                and deterministic
                and not need_weights
                and attn_mask is None
                and cache is None
                and key is query
                and Tq_ == Tk_ == L_
            ):
                from espresso_tpu.ops.attention_kernels import (
                    rel_attention,
                    supports_rel_attention,
                )

                if supports_rel_attention(
                    q.shape[0],
                    Tq_,
                    self.num_heads,
                    self.head_dim,
                    require_tpu=(fused_mode != "interpret"),
                ):
                    # fused Pallas path: scores + rel-shift + softmax + PV
                    # never leave VMEM (ops/attention_kernels.py)
                    B_, T_ = q.shape[0], Tq_
                    D_ = self.embed_dim
                    qf = q.reshape(B_, T_, D_)
                    kv_mask = (
                        key_padding_mask
                        if key_padding_mask is not None
                        else jnp.ones((B_, T_), bool)
                    )
                    ctx = rel_attention(
                        qf + self.pos_bias_u.reshape(D_),
                        qf + self.pos_bias_v.reshape(D_),
                        k.reshape(B_, T_, D_),
                        v.reshape(B_, T_, D_),
                        p_flat,
                        kv_mask,
                        self.num_heads,
                        scale,
                        fused_mode == "interpret",
                    )
                    return self.out_proj(ctx), None, new_cache
            # TRAIN fused path: OPT-IN via its own env switch, separate from
            # the inference kernel's (which earned default-on through an
            # on-chip A/B). ESPRESSO_FUSED_ATTN_TRAIN=auto|on enables it;
            # =interpret runs the interpret-mode kernel for CPU parity
            # tests; default off until an on-chip win is recorded in
            # STATUS.md. Note its in-kernel hash dropout draws a different
            # stream than flax RNG, so fused-vs-jnp training runs are only
            # comparable at dropout rate 0.
            train_mode = os.environ.get("ESPRESSO_FUSED_ATTN_TRAIN", "off")
            if (
                fused_mode != "off"
                and train_mode in ("auto", "on", "interpret")
                and not deterministic
                and not need_weights
                and attn_mask is None
                and cache is None
                and key is query
                and Tq_ == Tk_ == L_
            ):
                # forward applies attention-weight dropout in-kernel
                # (hash-derived mask, reference flax semantics:
                # keep ~ Bernoulli(1-rate), kept weights scaled 1/(1-rate));
                # backward is a flash-style Pallas kernel — no [B,H,T,T]
                # score tensors or skew reshapes in HBM
                # (ops/attention_kernels.rel_attention_train)
                from espresso_tpu.ops.attention_kernels import (
                    rel_attention_train,
                    supports_rel_attention_train,
                )

                if supports_rel_attention_train(
                    q.shape[0],
                    Tq_,
                    self.num_heads,
                    self.head_dim,
                    require_tpu=(train_mode != "interpret"),
                ):
                    B_, T_ = q.shape[0], Tq_
                    D_ = self.embed_dim
                    qf = q.reshape(B_, T_, D_)
                    kv_mask = (
                        key_padding_mask
                        if key_padding_mask is not None
                        else jnp.ones((B_, T_), bool)
                    )
                    if self.dropout > 0.0:
                        seed = jax.random.randint(
                            self.make_rng("dropout"),
                            (),
                            0,
                            jnp.int32(2**31 - 1),
                            dtype=jnp.int32,
                        )
                    else:
                        seed = jnp.int32(0)
                    ctx = rel_attention_train(
                        qf + self.pos_bias_u.reshape(D_),
                        qf + self.pos_bias_v.reshape(D_),
                        k.reshape(B_, T_, D_),
                        v.reshape(B_, T_, D_),
                        p_flat,
                        kv_mask,
                        seed,
                        self.num_heads,
                        scale,
                        float(self.dropout),
                        train_mode == "interpret",
                    )
                    return self.out_proj(ctx), None, new_cache
            p = p_flat.reshape(-1, self.num_heads, self.head_dim)
            q_u = q + self.pos_bias_u[None, None]
            q_v = q + self.pos_bias_v[None, None]
            ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
            # Two equivalent relative-shift implementations, chosen by
            # operating point (espnet convention, fairseq/modules/
            # espnet_multihead_attention.py rel_shift:
            # bd[b,h,q,k] = q_v[b,q,h,:] . p[k-q+L-1,h,:]):
            #
            #  - inference (deterministic=True): row-gather the projected
            #    table into [Tq,Tk,H,d] and contract directly. At decode
            #    batch sizes the classic pad/reshape/slice skew materializes
            #    four [B,H,Tq,2L-1] tensors per layer (~2.2 ms/layer at the
            #    flagship decode shape; encoder 156 -> 127.8 ms sustained).
            #  - training: the skew. At train batch (B=16) the gather form's
            #    [T,T,H,d] table + batch-of-T tiny matmuls lose badly
            #    (77.3 -> 134.7 ms/step measured, even with a scatter-free
            #    custom_vjp); the skew is pure pad/reshape/slice with cheap
            #    transpose adjoints.
            Tq, Tk = q.shape[1], k.shape[1]
            L = (p.shape[0] + 1) // 2
            if Tq == Tk == L and deterministic:
                # square self-attn: custom_vjp keeps the backward scatter-free
                # should anything differentiate an eval-mode apply
                bd = _rel_bd(q_v, p)
            elif Tq == Tk == L:
                # Transformer-XL relative shift: pad/reshape/slice. Table
                # rows are offsets (L-1)..-(L-1):
                # bd[i, j] = bd_full[i, j - i + (L-1)]  <=> offset (i - j)
                y = jnp.einsum("bqhd,phd->bhqp", q_v, p)
                B_, H_ = y.shape[0], y.shape[1]
                y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 1)))
                y = y.reshape(B_, H_, 2 * L * L)[:, :, : (2 * L - 1) * L]
                y = y.reshape(B_, H_, L, 2 * L - 1)
                bd = y[:, :, :, L - 1 :]
            elif deterministic:
                bd = jnp.einsum(
                    "bqhd,qkhd->bhqk", q_v, _gather_p_shift(p, Tq, Tk)
                )
            else:
                bd_full = jnp.einsum("bqhd,phd->bhqp", q_v, p)
                qi = jnp.arange(Tq)[:, None]
                kj = jnp.arange(Tk)[None, :]
                idx = jnp.clip((L - 1) + (kj - qi), 0, bd_full.shape[-1] - 1)
                idx_b = jnp.broadcast_to(
                    idx[None, None],
                    (bd_full.shape[0], bd_full.shape[1], Tq, Tk),
                )
                bd = jnp.take_along_axis(bd_full, idx_b, axis=-1)
            scores = (ac + bd) * scale
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale

        if attn_mask is not None:
            if attn_mask.ndim == 2:
                scores = scores + attn_mask[None, None]
            else:
                scores = scores + attn_mask[:, None]
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], scores, NEG_INF
            )
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        if self.dropout > 0.0 and not deterministic:
            weights = self.dropout_layer(weights, deterministic=False)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = self.out_proj(out.reshape(out.shape[0], out.shape[1], self.embed_dim))
        avg_weights = weights.mean(axis=1) if need_weights else None
        return out, avg_weights, new_cache

    def make_cross_attention_cache(self, encoder_out: jnp.ndarray) -> Dict[str, Any]:
        """Precompute encoder-side k/v once per utterance (decode fast path)."""
        return {
            "k_static": self._split(self.k_proj(encoder_out)),
            "v_static": self._split(self.v_proj(encoder_out)),
        }
