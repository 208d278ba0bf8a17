"""Pallas fused relative-position self-attention (inference).

The conformer encoder's inference attention (the decode hot path — the
encoder is ~40% of flagship decode wall after the scan-state rework) runs
eagerly in XLA: the AC and BD score einsums, the additive key mask, the
f32 softmax and the PV contraction each materialize [B, H, T, T] tensors
in HBM (~100 MB apiece at the flagship decode shape B=256, H=8, T'=156) —
the attention inner loop is bandwidth-bound while its matmul FLOPs are
trivial (~13 GFLOP/layer). This kernel computes, per grid block of
utterances, entirely in VMEM:

    ac      = (q + u) @ k^T                          (content scores)
    bd_full = (q + v) @ p^T        [T, 2T-1]         (position scores)
    bd      = rel_shift(bd_full)   bd[q,k] = bd_full[q, k-q+T-1]
    s       = (ac + bd) * scale + mask               (key-padding additive)
    out     = softmax_f32(s) @ v

matching the espnet rel-pos convention of modules/attention.py (reference
fairseq/modules/espnet_multihead_attention.py RelPositionMultiHeadedAttention;
conformer wiring espresso/modules/
conformer_with_relative_positional_embedding_encoder_layer.py:113-144).

The relative shift — the part that makes fused rel-attention kernels
awkward on TPU — is done with per-row circular rolls decomposed over the
row index's bits: row q must roll right by q, so for each bit b the whole
tile rolls by 2**b (``pltpu.roll``, a register-level lane rotation) and
rows with bit b set select the rolled copy. ceil(log2(T)) static rolls
replace the pad/reshape/slice skew (whose vector reshapes change the
sublane/lane split — Mosaic rejects them) and per-row dynamic slices
(single-row loads from multi-row bf16 tiles check-fail in
ApplyVectorLayout — see CLAUDE.md).

Layout: q/k/v stay in the natural [B, T, H*d] activations layout (the
trailing two dims map to (sublane, lane) tiles); heads are static lane
slices inside the kernel, so no [B, H, T, d] transposes are paid outside.
The position table is zero-padded to [W, H*d] with W a lane multiple so
the rolls are register-aligned; rolled reads never touch the padding for
valid rows (k - q + T - 1 <= 2T - 2 < W).

Used by modules/attention.py on the deterministic square self-attention
path (the conformer encoder at decode); the jnp path remains the numerical
reference and the fallback for CPU, training, need_weights, extra additive
masks and odd shapes. Backward (should anything differentiate an eval-mode
apply) recomputes through the jnp reference via custom_vjp.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from espresso_tpu.ops.backend import backend_is_tpu

NEG_INF = -1.0e8  # matches ops/masking.NEG_INF (reference -1e8 fill)

_VMEM_BUDGET = 12 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _vmem_bytes(nb: int, T: int, D: int, W: int) -> int:
    Tp = _ceil_to(T, 16)
    Wp = _ceil_to(W, 128)
    # qu/qv/k/v/out blocks (bf16 — rel_attention_fused casts operands) +
    # the p table + the f32 mask block. Mosaic double-buffers every
    # grid-blocked operand to pipeline iterations, so the IO side counts
    # twice (the round-3 estimate missed this and OOM'd scoped vmem at the
    # flagship decode shape: 20 MB allocated vs the 16 MB/core limit).
    io = 5 * nb * Tp * D * 2 + Wp * D * 2 + nb * _ceil_to(T, 128) * 4
    # per-(b,h) live tiles: ac + s [Tp, Tp] f32, bd_full + rolled [Tp, W] f32
    live = 2 * Tp * _ceil_to(Tp, 128) * 4 + 2 * Tp * Wp * 4
    return 2 * io + live


def _pick_nb(B: int, T: int, D: int, W: int) -> Optional[int]:
    for nb in (16, 8, 4, 2, 1):
        if B % nb != 0:
            continue
        if _vmem_bytes(nb, T, D, W) > _VMEM_BUDGET:
            continue
        return nb
    return None


def supports_rel_attention(
    B: int, T: int, H: int, d: int, require_tpu: bool = True
) -> bool:
    """Shape gate: lane-aligned head dim, a VMEM budget for the block, and
    a TPU backend (interpret-mode tests pass require_tpu=False). Policy
    (the ESPRESSO_FUSED_ATTN env switch) lives at the modules/attention.py
    call site; this answers only "can the kernel run this shape"."""
    if require_tpu and not backend_is_tpu():
        return False
    if d % 64 != 0 or (H * d) % 128 != 0 or T < 2:
        return False
    W = _ceil_to(2 * T - 1, 128)
    return _pick_nb(B, T, H * d, W) is not None


def rel_attention_reference(
    q_u: jnp.ndarray,  # [B, T, H, d]  (q + pos_bias_u)
    q_v: jnp.ndarray,  # [B, T, H, d]  (q + pos_bias_v)
    k: jnp.ndarray,  # [B, T, H, d]
    v: jnp.ndarray,  # [B, T, H, d]
    p: jnp.ndarray,  # [2T-1, H, d] projected position table
    key_valid: jnp.ndarray,  # [B, T] bool, True = valid key
    scale: float,
) -> jnp.ndarray:
    """Pure-jnp reference (modules/attention.py's deterministic path)."""
    T = q_u.shape[1]
    qi = jnp.arange(T)[:, None]
    kj = jnp.arange(T)[None, :]
    idx = jnp.clip((T - 1) + (kj - qi), 0, p.shape[0] - 1)
    p_shift = jnp.take(p, idx.reshape(-1), axis=0).reshape(
        T, T, p.shape[1], p.shape[2]
    )
    ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
    bd = jnp.einsum("bqhd,qkhd->bhqk", q_v, p_shift)
    scores = (ac + bd) * scale
    scores = jnp.where(key_valid[:, None, None, :], scores, NEG_INF)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q_u.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def _build_kernel(H: int, d: int, T: int, W: int, nb: int, scale: float):
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dn = (((1,), (1,)), ((), ()))  # x @ y^T (contract last dims)
    dnw = (((1,), (0,)), ((), ()))  # plain matmul
    nbits = max(1, (T - 1).bit_length())

    def kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref, o_ref):
        rowid = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
        for i in range(nb):
            # [1, T] f32 additive mask row. The mask rides as [B, 1, T] so
            # its block's constrained last-two dims are (1, T) — full-array —
            # and nb (any value, incl. < 8) is the free leading dim.
            mask_row = mask_ref[i]
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                qu = qu_ref[i, :, sl].astype(bf16)  # [T, d]
                qv = qv_ref[i, :, sl].astype(bf16)
                kh = k_ref[i, :, sl].astype(bf16)
                vh = v_ref[i, :, sl].astype(bf16)
                ph = p_ref[:, sl].astype(bf16)  # [W, d], zero rows >= 2T-1

                ac = jax.lax.dot_general(
                    qu, kh, dn, preferred_element_type=f32
                )  # [T, T]
                bd_full = jax.lax.dot_general(
                    qv, ph, dn, preferred_element_type=f32
                )  # [T, W]
                # per-row right-roll by the row index, bit by bit
                for b in range(nbits):
                    rolled = pltpu.roll(bd_full, 1 << b, axis=1)
                    bd_full = jnp.where(
                        ((rowid >> b) & 1) == 1, rolled, bd_full
                    )
                bd = jax.lax.slice(bd_full, (0, T - 1), (T, 2 * T - 1))
                # round each dot to bf16 and add in bf16: exactly the jnp
                # path's arithmetic (XLA bf16 dots accumulate f32 and round
                # once; (ac + bd) * scale then runs in bf16)
                s = (ac.astype(bf16) + bd.astype(bf16)) * bf16(scale)
                s = s.astype(f32) + mask_row  # broadcasts [1, T] over rows
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                z = jnp.sum(e, axis=1, keepdims=True)
                w = (e / z).astype(bf16)
                out = jax.lax.dot_general(
                    w, vh, dnw, preferred_element_type=f32
                )  # [T, d]
                o_ref[i, :, sl] = out.astype(o_ref.dtype)

    return kernel


def rel_attention_fused(
    q_u: jnp.ndarray,  # [B, T, D] flattened heads (q + u)
    q_v: jnp.ndarray,  # [B, T, D]
    k: jnp.ndarray,  # [B, T, D]
    v: jnp.ndarray,  # [B, T, D]
    p: jnp.ndarray,  # [2T-1, D] projected position table (flattened heads)
    key_valid: jnp.ndarray,  # [B, T] bool
    H: int,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused kernel call; returns the [B, T, D] context (pre out_proj)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, D = q_u.shape
    d = D // H
    assert p.shape == (2 * T - 1, D), (p.shape, T, D)
    W = _ceil_to(2 * T - 1, 128)
    nb = _pick_nb(B, T, D, W)
    assert nb is not None, "shape over VMEM budget — use the jnp path"

    out_dtype = q_u.dtype
    # the kernel's arithmetic is bf16 dots + f32 softmax regardless of the
    # operand dtype, so ship bf16 over the HBM->VMEM pipe (halves IO; f32
    # callers — e.g. a module applied on un-cast params — otherwise blow
    # the double-buffered block budget)
    bf16 = jnp.bfloat16
    q_u, q_v, k, v, p = (x.astype(bf16) for x in (q_u, q_v, k, v, p))
    p_pad = jnp.zeros((W, D), p.dtype).at[: 2 * T - 1].set(p)
    mask_add = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)

    kernel = _build_kernel(H, d, T, W, nb, scale)
    bs = pl.BlockSpec((nb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B // nb,),
        in_specs=(
            bs,
            bs,
            bs,
            bs,
            pl.BlockSpec((W, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nb, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_specs=bs,
        out_shape=jax.ShapeDtypeStruct((B, T, D), bf16),
        interpret=interpret,
    )(q_u, q_v, k, v, p_pad, mask_add[:, None, :])
    return out.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def rel_attention(q_u, q_v, k, v, p, key_valid, H, scale, interpret=False):
    """Fused rel-pos self-attention with a jnp-recompute backward. Inputs
    in the flattened-heads layout ([B, T, D]; p [2T-1, D]); out [B, T, D]."""
    return rel_attention_fused(
        q_u, q_v, k, v, p, key_valid, H, scale, interpret=interpret
    )


def _ref_flat(q_u, q_v, k, v, p, key_valid, H, scale):
    B, T, D = q_u.shape
    d = D // H
    split = lambda x: x.reshape(B, T, H, d)
    out = rel_attention_reference(
        split(q_u),
        split(q_v),
        split(k),
        split(v),
        p.reshape(-1, H, d),
        key_valid,
        scale,
    )
    return out.reshape(B, T, D)


def _rel_attention_fwd(q_u, q_v, k, v, p, key_valid, H, scale, interpret):
    out = rel_attention_fused(
        q_u, q_v, k, v, p, key_valid, H, scale, interpret=interpret
    )
    return out, (q_u, q_v, k, v, p, key_valid)


def _rel_attention_bwd(H, scale, interpret, res, g):
    q_u, q_v, k, v, p, key_valid = res
    _, vjp = jax.vjp(
        lambda a, b, c, d2, e: _ref_flat(a, b, c, d2, e, key_valid, H, scale),
        q_u,
        q_v,
        k,
        v,
        p,
    )
    dq_u, dq_v, dk, dv, dp = vjp(g)
    return dq_u, dq_v, dk, dv, dp, None


rel_attention.defvjp(_rel_attention_fwd, _rel_attention_bwd)
