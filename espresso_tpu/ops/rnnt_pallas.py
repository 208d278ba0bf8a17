"""Pallas lattice-free RNNT loss: the [B, T, U1, V] joint never touches HBM.

The XLA chunked loss (ops/rnnt_fused.py) is HBM-bound: each chunk writes the
[B, C, U1, V] fp32 logits (~53 MB at the flagship operating point), reads it
back for log-softmax, and gathers the blank/target columns — profiled at
~42 ms fwd+bwd of the 96 ms train step, >10x its FLOP cost. These kernels
compute, per (batch row, 128-frame tile), entirely in VMEM:

  forward:  pre     = relu(enc_proj[t] + dec_proj)          [U1p, J]
            logits  = pre @ W_out + b_out   (streamed over 128-wide V tiles)
            lse     = online logsumexp over the V tiles (flash-softmax style)
            lpb/lpl = blank / target-column log-probs        [U1p, 128]

  backward: recomputes the logits tiles and contracts the occupancy-weighted
            softmax gradient into g_enc / g_dec / g_W / g_b on the fly —
            g_logits exists only as a [rows, 128] tile in VMEM.

The alpha/beta DP recursions stay in XLA (ops/rnnt.py `_forward_alpha` /
`_backward_beta` — [B, U1] per frame, exactly the tested lattice-path
semantics); occupancies are formed vectorized over all frames at once.

Reference semantics: espresso/criterions/transducer_loss.py:1-108 (torchaudio
rnnt_loss); numerics verified against ops/rnnt.py's lattice loss and
ops/rnnt_fused.py's chunked loss (tests/test_rnnt_fused.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.ops.backend import backend_is_tpu

NEG_INF = -1.0e30
_T_TILE = 128  # frames per grid step (lane dim of the kernel outputs)
_FPB = 4  # frames batched per inner matmul (rows = _FPB * U1p)
_VMEM_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_bytes(U1p: int, J: int, V: int) -> int:
    rows = _FPB * U1p
    w = J * V * 4  # weights (worst case f32)
    blocks = (_T_TILE * J + U1p * J) * 4
    outs = 6 * U1p * _T_TILE * 4
    work = rows * (2 * J + 4 * 128 + 8) * 4 + J * V * 4  # pre/gpre/tiles + g_W
    return w + blocks + outs + work


def supports_rnnt_pallas(U1: int, J: int, V: int) -> bool:
    """Shape gate: lane-aligned weights and a VMEM budget; everything else
    (T, B, U1) is padded/tiled. Falls back to the XLA chunked path."""
    U1p = _round_up(U1, 16)
    return (
        V % 128 == 0
        and J % 128 == 0
        and _vmem_bytes(U1p, J, V) <= _VMEM_BUDGET
        and backend_is_tpu()
    )


def _prep(enc_proj, dec_proj, targets, blank):
    """Pad shapes to kernel tiles; build the [B, U1p, 1] target-id column."""
    B, T, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    U1p = _round_up(U1, 16)
    Tp = _round_up(T, _T_TILE)
    enc_p = jnp.pad(enc_proj, ((0, 0), (0, Tp - T), (0, 0)))
    dec_p = jnp.pad(dec_proj, ((0, 0), (0, U1p - U1), (0, 0)))
    tgt = jnp.concatenate(
        [targets.astype(jnp.int32), jnp.zeros((B, 1), jnp.int32)], axis=1
    )
    tgt_p = jnp.pad(tgt, ((0, 0), (0, U1p - U1)))[:, :, None]  # [B, U1p, 1]
    return enc_p, dec_p, tgt_p, U1p, Tp


def rnnt_joint_lp(
    enc_proj: jnp.ndarray,  # [B, T, J]
    dec_proj: jnp.ndarray,  # [B, U1, J]
    fc_kernel: jnp.ndarray,  # [J, V]
    fc_bias: jnp.ndarray,  # [V]
    targets: jnp.ndarray,  # [B, U]
    blank: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (lp_blank [B,T,U1], lp_label [B,T,U1], lse [B,U1p,Tp]) —
    lp_label already NEG_INF-masked at u == U1-1 (no label from the last
    row, matching ops/rnnt._gather_transitions)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    V = fc_kernel.shape[1]
    enc_p, dec_p, tgt_p, U1p, Tp = _prep(enc_proj, dec_proj, targets, blank)
    R = _FPB * U1p
    n_vt = V // 128
    bt, bcol = blank // 128, blank % 128
    cdt = enc_proj.dtype  # matmul dtype (bf16 under mixed precision)

    def kernel(enc_ref, dec_ref, tgt_ref, w_ref, b_ref,
               lpb_ref, lpl_ref, lse_ref):
        dec = dec_ref[0].astype(jnp.float32)  # [U1p, J]
        # full-tile load; per-frame rows are extracted below by one-hot
        # mask-reduce over the sublane dim. A single-row bf16 vector.load
        # from this multi-row tile fails Mosaic's ApplyVectorLayout on v5e
        # (the round-2 blocker) — same workaround as decode_kernels.aes_merge
        enc_f = enc_ref[0].astype(jnp.float32)  # [T_TILE, J]
        sub_enc = jax.lax.broadcasted_iota(jnp.int32, (_T_TILE, J), 0)
        tgtc = tgt_ref[0]  # [U1p, 1] i32
        tgt4 = jnp.concatenate([tgtc] * _FPB, axis=0)  # [R, 1]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (U1p, _T_TILE), 1)
        colsR = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        lpb_ref[0] = jnp.zeros((U1p, _T_TILE), jnp.float32)
        lpl_ref[0] = jnp.zeros((U1p, _T_TILE), jnp.float32)
        lse_ref[0] = jnp.zeros((U1p, _T_TILE), jnp.float32)

        def body(it, _):
            base = it * _FPB
            pres = []
            for i in range(_FPB):
                e = jnp.sum(
                    jnp.where(sub_enc == base + i, enc_f, 0.0),
                    axis=0, keepdims=True,
                )  # [1, J]
                pres.append(jnp.maximum(e + dec, 0.0))
            pre = jnp.concatenate(pres, axis=0).astype(cdt)  # [R, J]
            m = jnp.full((R, 1), NEG_INF, jnp.float32)
            s = jnp.zeros((R, 1), jnp.float32)
            lb = jnp.zeros((R, 1), jnp.float32)
            lt = jnp.zeros((R, 1), jnp.float32)
            for vt in range(n_vt):
                logits = jax.lax.dot_general(
                    pre, w_ref[:, vt * 128:(vt + 1) * 128],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b_ref[:, vt * 128:(vt + 1) * 128].astype(jnp.float32)
                tm = jnp.max(logits, axis=1, keepdims=True)
                nm = jnp.maximum(m, tm)
                s = s * jnp.exp(m - nm) + jnp.sum(
                    jnp.exp(logits - nm), axis=1, keepdims=True
                )
                m = nm
                if vt == bt:
                    # single-lane slice -> mask-reduce (Mosaic-safe)
                    lb = jnp.sum(
                        jnp.where(colsR == bcol, logits, 0.0),
                        axis=1, keepdims=True,
                    )
                tmask = (colsR + vt * 128) == tgt4
                lt = lt + jnp.sum(
                    jnp.where(tmask, logits, 0.0), axis=1, keepdims=True
                )
            lse = m + jnp.log(s)
            for i in range(_FPB):
                sl = slice(i * U1p, (i + 1) * U1p)
                cm = lanes == (base + i)
                lpb_ref[0] += jnp.where(cm, lb[sl] - lse[sl], 0.0)
                lpl_ref[0] += jnp.where(cm, lt[sl] - lse[sl], 0.0)
                lse_ref[0] += jnp.where(cm, lse[sl], 0.0)
            return 0

        jax.lax.fori_loop(0, _T_TILE // _FPB, body, 0)

    grid = (B, Tp // _T_TILE)
    lpb, lpl, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _T_TILE, J), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, U1p, Tp), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, Tp), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, Tp), jnp.float32),
        ),
        interpret=interpret,
    )(enc_p, dec_p, tgt_p, fc_kernel, fc_bias.reshape(1, V))

    # [B, U1p, Tp] -> [B, T, U1], label col U1-1 masked (rnnt.py:59-60)
    lp_blank = jnp.moveaxis(lpb, 2, 1)[:, :T, :U1]
    lp_label = jnp.moveaxis(lpl, 2, 1)[:, :T, :U1]
    u_idx = jnp.arange(U1)[None, None, :]
    lp_label = jnp.where(u_idx < U1 - 1, lp_label, NEG_INF)
    return lp_blank, lp_label, lse


def rnnt_joint_bwd(
    enc_proj: jnp.ndarray,  # [B, T, J]
    dec_proj: jnp.ndarray,  # [B, U1, J]
    fc_kernel: jnp.ndarray,  # [J, V]
    fc_bias: jnp.ndarray,  # [V]
    targets: jnp.ndarray,  # [B, U]
    lse: jnp.ndarray,  # [B, U1p, Tp] stashed by rnnt_joint_lp
    occb_n: jnp.ndarray,  # [B, T, U1] f32: -g * occ_blank
    occl_n: jnp.ndarray,  # [B, T, U1] f32: -g * occ_label
    blank: int,
    interpret: bool = False,
):
    """d(loss)/d(logits) contracted in-kernel: returns (g_enc [B,T,J] f32,
    g_dec [B,U1,J] f32, g_W [J,V] f32, g_b [V] f32).

    g_logits = g_lp - softmax * sum(g_lp) with g_lp nonzero only at the
    blank/target columns (ops/rnnt_fused.py:266-271) — formed tile-by-tile
    and immediately contracted, never written to HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, J = enc_proj.shape
    U1 = dec_proj.shape[1]
    V = fc_kernel.shape[1]
    enc_p, dec_p, tgt_p, U1p, Tp = _prep(enc_proj, dec_proj, targets, blank)
    R = _FPB * U1p
    n_vt = V // 128
    bt, bcol = blank // 128, blank % 128
    cdt = enc_proj.dtype

    # [B, T, U1] -> kernel layout [B, U1p, Tp]; occ pads are zero (no
    # gradient contribution from padded frames/rows)
    def to_kernel_layout(x):
        xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, U1p - U1)))
        return jnp.moveaxis(xp, 1, 2)

    occb_k = to_kernel_layout(occb_n.astype(jnp.float32))
    occl_k = to_kernel_layout(occl_n.astype(jnp.float32))

    def kernel(enc_ref, dec_ref, tgt_ref, w_ref, b_ref, lse_ref, ob_ref,
               ol_ref, genc_ref, gdec_ref, gw_ref, gb_ref):
        b_i = pl.program_id(0)
        t_i = pl.program_id(1)

        @pl.when(t_i == 0)
        def _():
            gdec_ref[0] = jnp.zeros((U1p, J), jnp.float32)

        @pl.when(jnp.logical_and(b_i == 0, t_i == 0))
        def _():
            gw_ref[:] = jnp.zeros((J, V), jnp.float32)
            gb_ref[:] = jnp.zeros((1, V), jnp.float32)

        dec = dec_ref[0].astype(jnp.float32)
        # full-tile load + sublane mask-reduce (see the forward kernel note:
        # single-row bf16 loads from this tile fail ApplyVectorLayout)
        enc_f = enc_ref[0].astype(jnp.float32)  # [T_TILE, J]
        sub_enc = jax.lax.broadcasted_iota(jnp.int32, (_T_TILE, J), 0)
        tgtc = tgt_ref[0]
        tgt4 = jnp.concatenate([tgtc] * _FPB, axis=0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (U1p, _T_TILE), 1)
        colsR = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        lse_blk = lse_ref[0]
        ob_blk = ob_ref[0]
        ol_blk = ol_ref[0]

        def col4(blk, base):
            # per-frame [U1p, 1] columns via mask-reduce (lane-dim slicing
            # miscompiles in Mosaic — see ops/decode_kernels.aes_merge)
            outs = []
            for i in range(_FPB):
                cm = lanes == (base + i)
                outs.append(
                    jnp.sum(jnp.where(cm, blk, 0.0), axis=1, keepdims=True)
                )
            return jnp.concatenate(outs, axis=0)  # [R, 1]

        def body(it, genc_acc):
            base = it * _FPB
            pres = []
            for i in range(_FPB):
                e = jnp.sum(
                    jnp.where(sub_enc == base + i, enc_f, 0.0),
                    axis=0, keepdims=True,
                )  # [1, J]
                pres.append(jnp.maximum(e + dec, 0.0))
            pre_f = jnp.concatenate(pres, axis=0)  # [R, J] f32
            pre = pre_f.astype(cdt)
            lse4 = col4(lse_blk, base)
            ob4 = col4(ob_blk, base)
            ol4 = col4(ol_blk, base)
            sg = ob4 + ol4  # sum over V of g_lp (only two nonzero columns)
            gpre = jnp.zeros((R, J), jnp.float32)
            for vt in range(n_vt):
                wt = w_ref[:, vt * 128:(vt + 1) * 128]  # [J, 128]
                logits = jax.lax.dot_general(
                    pre, wt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b_ref[:, vt * 128:(vt + 1) * 128].astype(jnp.float32)
                p = jnp.exp(logits - lse4)
                glog = -p * sg
                if vt == bt:
                    bmask = colsR == bcol
                    glog = glog + jnp.where(bmask, ob4, 0.0)
                tmask = (colsR + vt * 128) == tgt4
                glog = glog + jnp.where(tmask, ol4, 0.0)
                gb_ref[:, vt * 128:(vt + 1) * 128] += jnp.sum(
                    glog, axis=0, keepdims=True
                )
                glog_c = glog.astype(cdt)
                gw_ref[:, vt * 128:(vt + 1) * 128] += jax.lax.dot_general(
                    pre, glog_c,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gpre += jax.lax.dot_general(
                    glog_c, wt,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            gpre = jnp.where(pre_f > 0.0, gpre, 0.0)
            for i in range(_FPB):
                sl = slice(i * U1p, (i + 1) * U1p)
                row = jnp.sum(gpre[sl], axis=0, keepdims=True)  # [1, J]
                # scatter frame base+i's row into the tile-wide accumulator
                # (single-row stores to the f32 output tile are the same
                # Mosaic hazard as the loads above — store once at the end)
                genc_acc = genc_acc + jnp.where(
                    sub_enc == base + i,
                    jnp.broadcast_to(row, (_T_TILE, J)),
                    0.0,
                )
                gdec_ref[0] += gpre[sl]
            return genc_acc

        genc_final = jax.lax.fori_loop(
            0, _T_TILE // _FPB, body, jnp.zeros((_T_TILE, J), jnp.float32)
        )
        genc_ref[0] = genc_final

    grid = (B, Tp // _T_TILE)
    g_enc, g_dec, g_W, g_b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _T_TILE, J), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, _T_TILE), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _T_TILE, J), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1p, J), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, J), jnp.float32),
            jax.ShapeDtypeStruct((B, U1p, J), jnp.float32),
            jax.ShapeDtypeStruct((J, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ),
        interpret=interpret,
    )(enc_p, dec_p, tgt_p, fc_kernel, fc_bias.reshape(1, V), lse, occb_k,
      occl_k)
    return g_enc[:, :T], g_dec[:, :U1], g_W, g_b[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def rnnt_loss_fused_pallas(
    enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths, tgt_lengths,
    blank, interpret=False,
):
    """Per-example transducer NLL via the Pallas joint kernels; value/grad
    parity with ops/rnnt_fused.rnnt_loss_fused (tested in interpret mode)."""
    from espresso_tpu.ops.rnnt import _forward_alpha

    lpb, lpl, _ = rnnt_joint_lp(
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, blank, interpret
    )
    _, logZ = _forward_alpha(lpb, lpl, src_lengths, tgt_lengths)
    return -logZ


def _pallas_fwd(enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
                tgt_lengths, blank, interpret):
    from espresso_tpu.ops.rnnt import _forward_alpha

    lpb, lpl, lse = rnnt_joint_lp(
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, blank, interpret
    )
    alphas, logZ = _forward_alpha(lpb, lpl, src_lengths, tgt_lengths)
    return -logZ, (
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
        tgt_lengths, lpb, lpl, lse, alphas, logZ,
    )


def _pallas_bwd(blank, interpret, res, g):
    from espresso_tpu.ops.rnnt import _backward_beta

    (enc_proj, dec_proj, fc_kernel, fc_bias, targets, src_lengths,
     tgt_lengths, lpb, lpl, lse, alphas, logZ) = res
    B, T, U1 = lpb.shape
    betas = _backward_beta(lpb, lpl, src_lengths, tgt_lengths)

    # occupancies, vectorized over all frames (semantics: rnnt.py:199-223)
    t_idx = jnp.arange(T)[None, :, None]
    u_idx = jnp.arange(U1)[None, None, :]
    beta_next_t = jnp.concatenate(
        [betas[:, 1:], jnp.full((B, 1, U1), NEG_INF)], axis=1
    )
    is_terminal = (t_idx == (src_lengths - 1)[:, None, None]) & (
        u_idx == tgt_lengths[:, None, None]
    )
    beta_after_blank = jnp.where(is_terminal, 0.0, beta_next_t)
    occ_blank = jnp.exp(alphas + lpb + beta_after_blank - logZ[:, None, None])
    beta_right = jnp.concatenate(
        [betas[:, :, 1:], jnp.full((B, T, 1), NEG_INF)], axis=2
    )
    occ_label = jnp.exp(alphas + lpl + beta_right - logZ[:, None, None])
    valid = (t_idx < src_lengths[:, None, None]) & (
        u_idx <= tgt_lengths[:, None, None]
    )
    occ_blank = jnp.where(valid, occ_blank, 0.0)
    occ_label = jnp.where(
        valid & (u_idx < tgt_lengths[:, None, None]), occ_label, 0.0
    )
    # loss = -logZ, so d loss/d lp = -occ; fold upstream g in here
    g3 = g[:, None, None].astype(jnp.float32)
    occb_n = -occ_blank * g3
    occl_n = -occ_label * g3

    g_enc, g_dec, g_W, g_b = rnnt_joint_bwd(
        enc_proj, dec_proj, fc_kernel, fc_bias, targets, lse, occb_n, occl_n,
        blank, interpret,
    )
    return (
        g_enc.astype(enc_proj.dtype),
        g_dec.astype(dec_proj.dtype),
        g_W.astype(fc_kernel.dtype),
        g_b.astype(fc_bias.dtype),
        None,
        None,
        None,
    )


rnnt_loss_fused_pallas.defvjp(_pallas_fwd, _pallas_bwd)
