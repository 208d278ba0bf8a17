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
import numpy as np

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


# ---------------------------------------------------------------------------
# Training path: fused forward WITH attention-weight dropout + a real Pallas
# backward (flash-style: no residual score tensors — the backward recomputes
# scores/softmax/dropout-mask in VMEM and emits dq_u/dq_v/dk/dv/dp directly).
#
# At the flagship train point (B=16, T'=256, 16 layers, d=512, H=8) the jnp
# path materializes ~10 HBM passes of [B,H,T,T]/[B,H,T,2T-1] tensors per
# layer fwd+bwd (the ac/bd einsums, the pad/reshape/slice skew and its
# transpose adjoints, the f32 softmax, the dropout mask, PV and its two
# adjoints) — measured ~0.1 ms per skew reshape alone in the round-4 train
# trace. Here each (item, head) tile lives entirely in VMEM.
#
# Dropout: the reference semantics are flax nn.Dropout on the softmax
# weights (modules/attention.py:343-344) — keep ~ Bernoulli(1-rate), kept
# weights scaled by 1/(1-rate). The mask comes from a counter-based integer
# hash of (seed, batch item, head, q, k) computed IN the kernel with plain
# int32 ops, so (a) the backward regenerates the exact forward mask from
# the same scalar seed with no stored residual, (b) interpret mode (CPU
# tests) produces bit-identical masks to the compiled kernel, and
# (c) `dropout_keep_mask` below replays it in pure jnp for oracle tests.
# The stream differs from flax's threefry draw — dropout distribution, not
# bit-parity with the jnp path, is the contract under ESPRESSO_FUSED_ATTN.
# ---------------------------------------------------------------------------

def _i32(v: int) -> int:
    """Python int -> the int32 two's-complement value (for constants)."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _lshr(x, s: int):
    """Logical right shift on int32 lanes: arithmetic shift + mask (plain
    jnp int ops — broadcast-friendly, identical under Mosaic/interpret).
    Constants are numpy scalars so they inline as jaxpr literals (a jax
    scalar would become a captured const, which pallas_call rejects)."""
    return (x >> s) & np.int32((1 << (32 - s)) - 1)


def _imix(x):
    """xorshift-multiply finalizer (murmur3-style) on int32 lanes."""
    x = x ^ _lshr(x, 16)
    x = x * np.int32(_i32(0x85EBCA6B))
    x = x ^ _lshr(x, 13)
    x = x * np.int32(_i32(0xC2B2AE35))
    x = x ^ _lshr(x, 16)
    return x


def _keep_mask_tile(seed, item, head, Tq, Tk):
    """[Tq, Tk] int32 in [0, 2^31): the dropout draw for (seed, item, head).

    Plain int32 jnp ops (wrapping mul, masked shifts) — identical under
    Mosaic, interpret mode, and the host-side oracle. The sign bit is
    dropped before the threshold compare so the compare stays signed-safe;
    31 uniform bits are plenty for a dropout draw.

    The (seed, item, head) triple is finalized with ``_imix`` BEFORE the
    row index enters the stream: folding ``item`` and ``q`` linearly with
    the same multiplier made the hash a function of ``item + q``, so each
    batch item's mask was a row-shifted copy of its neighbor's (correlated
    draws across the batch). The nonlinear finalize breaks the aliasing;
    ``test_train_dropout_mask_not_shifted_copies`` pins it.
    """
    gold = np.int32(_i32(0x9E3779B1))
    q = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
    # head is static — fold its product at trace time; item may be a python
    # int (the host oracle) or a traced scalar (in-kernel) — route it
    # through jnp so the wrapping multiply stays int32 without numpy's
    # scalar-overflow warning
    head_c = np.int32(_i32(head * 0x27D4EB2F))
    x = _imix(seed + jnp.asarray(item, jnp.int32) * gold + head_c)
    x = _imix(x + q * gold)
    x = _imix(x ^ (kk * np.int32(0x165667B1)))
    return _lshr(x, 1)  # 31 uniform bits, >= 0


def dropout_keep_mask(seed, item, head, Tq, Tk, rate):
    """Host/jnp oracle of the in-kernel dropout draw: True = keep."""
    thresh = jnp.int32(int(round((1.0 - rate) * ((1 << 31) - 1))))
    return _keep_mask_tile(jnp.int32(seed), item, head, Tq, Tk) < thresh


def rel_attention_train_reference(
    q_u, q_v, k, v, p, key_valid, H, scale, rate, seed
):
    """Pure-jnp reference of the train kernel (same mask hash). [B,T,D] in."""
    B, T, D = q_u.shape
    d = D // H
    split = lambda x: x.reshape(B, T, H, d)
    qu, qv, kh, vh = split(q_u), split(q_v), split(k), split(v)
    ph = p.reshape(-1, H, d)
    out = rel_attention_reference(qu, qv, kh, vh, ph, key_valid, scale)
    if rate <= 0.0:
        return out.reshape(B, T, D)
    # redo the PV contraction with the dropout mask applied to the weights
    qi = jnp.arange(T)[:, None]
    kj = jnp.arange(T)[None, :]
    idx = jnp.clip((T - 1) + (kj - qi), 0, ph.shape[0] - 1)
    p_shift = jnp.take(ph, idx.reshape(-1), axis=0).reshape(T, T, H, d)
    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, kh)
    bd = jnp.einsum("bqhd,qkhd->bhqk", qv, p_shift)
    scores = (ac + bd) * scale
    scores = jnp.where(key_valid[:, None, None, :], scores, NEG_INF)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q_u.dtype)
    keep = jnp.stack(
        [
            jnp.stack(
                [dropout_keep_mask(seed, b, h, T, T, rate) for h in range(H)]
            )
            for b in range(B)
        ]
    )  # [B, H, T, T]
    w = jnp.where(keep, w / jnp.asarray(1.0 - rate, w.dtype), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(B, T, D)


def _vmem_bytes_train(nb: int, T: int, D: int, W: int) -> int:
    Tp = _ceil_to(T, 16)
    Wp = _ceil_to(W, 128)
    # bwd is the fat one: 6 bf16 in blocks (qu/qv/k/v/g + p) + 4 bf16 out
    # blocks + f32 dp accumulator + mask; double-buffered
    io = (
        5 * nb * Tp * D * 2  # qu qv k v g
        + Wp * D * 2  # p
        + 4 * nb * Tp * D * 2  # dqu dqv dk dv
        + Wp * D * 4  # dp (f32 accumulator block)
        + nb * _ceil_to(T, 128) * 4
    )
    # live f32 tiles: ac/s/w/dw/ds [Tp,Tp] + bd_full/dbd + a rolled copy
    live = 5 * Tp * _ceil_to(Tp, 128) * 4 + 3 * Tp * Wp * 4
    return 2 * io + live


def _pick_nb_train(B: int, T: int, D: int, W: int) -> Optional[int]:
    for nb in (8, 4, 2, 1):
        if B % nb != 0:
            continue
        if _vmem_bytes_train(nb, T, D, W) > _VMEM_BUDGET:
            continue
        return nb
    return None


def supports_rel_attention_train(
    B: int, T: int, H: int, d: int, require_tpu: bool = True
) -> bool:
    if require_tpu and not backend_is_tpu():
        return False
    if d % 64 != 0 or (H * d) % 128 != 0 or T < 2:
        return False
    W = _ceil_to(2 * T - 1, 128)
    return _pick_nb_train(B, T, H * d, W) is not None


def _build_train_kernels(
    H: int, d: int, T: int, W: int, nb: int, scale: float, rate: float
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dn = (((1,), (1,)), ((), ()))  # x @ y^T
    dnw = (((1,), (0,)), ((), ()))  # x @ y
    dnt = (((0,), (0,)), ((), ()))  # x^T @ y
    nbits = max(1, (T - 1).bit_length())
    thresh = np.int32(int(round((1.0 - rate) * ((1 << 31) - 1))))
    inv_keep = float(1.0 / (1.0 - rate)) if rate > 0.0 else 1.0

    def _scores(i, h, qu_ref, qv_ref, k_ref, p_ref, mask_ref, rowid):
        """Recompute s (pre-softmax, f32, masked) for one (item, head)."""
        sl = slice(h * d, (h + 1) * d)
        qu = qu_ref[i, :, sl].astype(bf16)
        qv = qv_ref[i, :, sl].astype(bf16)
        kh = k_ref[i, :, sl].astype(bf16)
        ph = p_ref[:, sl].astype(bf16)
        ac = jax.lax.dot_general(qu, kh, dn, preferred_element_type=f32)
        bd_full = jax.lax.dot_general(qv, ph, dn, preferred_element_type=f32)
        for b in range(nbits):
            rolled = pltpu.roll(bd_full, 1 << b, axis=1)
            bd_full = jnp.where(((rowid >> b) & 1) == 1, rolled, bd_full)
        bd = jax.lax.slice(bd_full, (0, T - 1), (T, 2 * T - 1))
        s = (ac.astype(bf16) + bd.astype(bf16)) * bf16(scale)
        return s.astype(f32) + mask_ref[i], (qu, qv, kh)

    def _softmax(s):
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        return e / jnp.sum(e, axis=1, keepdims=True)  # f32 [T, T]

    def fwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref,
                   o_ref):
        rowid = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
        g0 = pl.program_id(0)
        for i in range(nb):
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                s, _ = _scores(i, h, qu_ref, qv_ref, k_ref, p_ref, mask_ref,
                               rowid)
                w = _softmax(s)
                if rate > 0.0:
                    item = g0 * nb + i
                    bits = _keep_mask_tile(seed_ref[0], item, h, T, T)
                    w = jnp.where(bits < thresh, w * inv_keep, 0.0)
                vh = v_ref[i, :, sl].astype(bf16)
                out = jax.lax.dot_general(
                    w.astype(bf16), vh, dnw, preferred_element_type=f32
                )
                o_ref[i, :, sl] = out.astype(o_ref.dtype)

    def bwd_kernel(seed_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, mask_ref,
                   g_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, dp_ref):
        rowid = jax.lax.broadcasted_iota(jnp.int32, (T, W), 0)
        g0 = pl.program_id(0)

        @pl.when(g0 == 0)
        def _zero_dp():
            dp_ref[...] = jnp.zeros(dp_ref.shape, dp_ref.dtype)

        for i in range(nb):
            for h in range(H):
                sl = slice(h * d, (h + 1) * d)
                s, (qu, qv, kh) = _scores(
                    i, h, qu_ref, qv_ref, k_ref, p_ref, mask_ref, rowid
                )
                w = _softmax(s)  # f32 [T, T]
                if rate > 0.0:
                    item = g0 * nb + i
                    bits = _keep_mask_tile(seed_ref[0], item, h, T, T)
                    keepf = jnp.where(bits < thresh, inv_keep, f32(0.0))
                    w_used = w * keepf
                else:
                    keepf = None
                    w_used = w
                gh = g_ref[i, :, sl].astype(bf16)  # [T, d]
                vh = v_ref[i, :, sl].astype(bf16)
                # dv = w_used^T @ g
                dv = jax.lax.dot_general(
                    w_used.astype(bf16), gh, dnt, preferred_element_type=f32
                )
                dv_ref[i, :, sl] = dv.astype(dv_ref.dtype)
                # dw_used = g @ v^T; chain through dropout then softmax
                dwu = jax.lax.dot_general(
                    gh, vh, dn, preferred_element_type=f32
                )  # [T, T]
                dw = dwu * keepf if rate > 0.0 else dwu
                ds = w * (dw - jnp.sum(dw * w, axis=1, keepdims=True))
                ds = ds * f32(scale)  # d/dac and d/dbd share the scale
                dsb = ds.astype(bf16)
                # dq_u = ds @ k ; dk = ds^T @ q_u
                dqu = jax.lax.dot_general(
                    dsb, kh, dnw, preferred_element_type=f32
                )
                dk = jax.lax.dot_general(
                    dsb, qu, dnt, preferred_element_type=f32
                )
                dqu_ref[i, :, sl] = dqu.astype(dqu_ref.dtype)
                dk_ref[i, :, sl] = dk.astype(dk_ref.dtype)
                # d(bd): place ds into the [T-1, 2T-1) columns of a [T, W]
                # tile (the adjoint of the forward's slice), then invert the
                # forward's per-row right-roll-by-q: left-roll by q ==
                # right-roll by W - 2^b per set bit of q (rolls compose
                # additively mod W). The placement is concat-to-width then a
                # STATIC whole-tile roll by T-1 — dynamic_update_slice has
                # no Mosaic TC lowering (caught by aot_check train_fused;
                # interpret-mode tests never exercise Mosaic lowering)
                dbd = jnp.concatenate(
                    [ds, jnp.zeros((T, W - T), f32)], axis=1
                )
                dbd = pltpu.roll(dbd, T - 1, axis=1)
                for b in range(nbits):
                    rolled = pltpu.roll(dbd, W - (1 << b), axis=1)
                    dbd = jnp.where(((rowid >> b) & 1) == 1, rolled, dbd)
                dbdb = dbd.astype(bf16)
                ph = p_ref[:, sl].astype(bf16)
                dqv = jax.lax.dot_general(
                    dbdb, ph, dnw, preferred_element_type=f32
                )  # [T, d]
                dqv_ref[i, :, sl] = dqv.astype(dqv_ref.dtype)
                # dp += dbd^T @ q_v   [W, d], f32 accumulate across the grid
                dp = jax.lax.dot_general(
                    dbdb, qv, dnt, preferred_element_type=f32
                )
                dp_ref[:, sl] = dp_ref[:, sl] + dp

    return fwd_kernel, bwd_kernel


def _train_call(
    which, q_u, q_v, k, v, p, key_valid, seed, g, H, scale, rate, interpret
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, D = q_u.shape
    d = D // H
    assert p.shape == (2 * T - 1, D), (p.shape, T, D)
    W = _ceil_to(2 * T - 1, 128)
    nb = _pick_nb_train(B, T, D, W)
    assert nb is not None, "shape over VMEM budget — use the jnp path"

    bf16 = jnp.bfloat16
    q_u, q_v, k, v = (x.astype(bf16) for x in (q_u, q_v, k, v))
    p_pad = jnp.zeros((W, D), bf16).at[: 2 * T - 1].set(p.astype(bf16))
    mask_add = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)[
        :, None, :
    ]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))

    fwd_kernel, bwd_kernel = _build_train_kernels(H, d, T, W, nb, scale, rate)
    bs = pl.BlockSpec((nb, T, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ps = pl.BlockSpec((W, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ms = pl.BlockSpec((nb, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ss = pl.BlockSpec(memory_space=pltpu.SMEM)

    if which == "fwd":
        out = pl.pallas_call(
            fwd_kernel,
            grid=(B // nb,),
            in_specs=(ss, bs, bs, bs, bs, ps, ms),
            out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((B, T, D), bf16),
            interpret=interpret,
        )(seed_arr, q_u, q_v, k, v, p_pad, mask_add)
        return out
    g = g.astype(bf16)
    dps = pl.BlockSpec((W, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dqu, dqv, dk, dv, dp_pad = pl.pallas_call(
        bwd_kernel,
        grid=(B // nb,),
        in_specs=(ss, bs, bs, bs, bs, ps, ms, bs),
        out_specs=(bs, bs, bs, bs, dps),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), bf16),
            jax.ShapeDtypeStruct((B, T, D), bf16),
            jax.ShapeDtypeStruct((B, T, D), bf16),
            jax.ShapeDtypeStruct((B, T, D), bf16),
            jax.ShapeDtypeStruct((W, D), jnp.float32),
        ),
        interpret=interpret,
    )(seed_arr, q_u, q_v, k, v, p_pad, mask_add, g)
    return dqu, dqv, dk, dv, dp_pad[: 2 * T - 1]


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def rel_attention_train(
    q_u, q_v, k, v, p, key_valid, seed, H, scale, rate, interpret=False
):
    """Fused rel-pos self-attention for TRAINING: forward applies
    attention-weight dropout in-kernel; backward is a flash-style Pallas
    kernel that recomputes scores/softmax/mask and emits all five input
    gradients (dq_u, dq_v, dk, dv, dp) without materializing [B,H,T,T]
    score tensors in HBM. Inputs in flattened-heads layout ([B, T, D];
    p [2T-1, D]); out [B, T, D] in the q_u dtype."""
    out_dtype = q_u.dtype
    return _train_call(
        "fwd", q_u, q_v, k, v, p, key_valid, seed, None, H, scale, rate,
        interpret,
    ).astype(out_dtype)


def _rel_attention_train_fwd(
    q_u, q_v, k, v, p, key_valid, seed, H, scale, rate, interpret
):
    out = rel_attention_train(
        q_u, q_v, k, v, p, key_valid, seed, H, scale, rate, interpret
    )
    return out, (q_u, q_v, k, v, p, key_valid, seed)


def _rel_attention_train_bwd(H, scale, rate, interpret, res, g):
    q_u, q_v, k, v, p, key_valid, seed = res
    dqu, dqv, dk, dv, dp = _train_call(
        "bwd", q_u, q_v, k, v, p, key_valid, seed, g, H, scale, rate,
        interpret,
    )
    cast = lambda t, x: t.astype(x.dtype)
    return (
        cast(dqu, q_u),
        cast(dqv, q_v),
        cast(dk, k),
        cast(dv, v),
        cast(dp, p),
        None,
        None,
    )


rel_attention_train.defvjp(_rel_attention_train_fwd, _rel_attention_train_bwd)
