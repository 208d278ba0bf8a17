"""Pallas decode kernels: fused transducer joint + log-softmax + top-k.

The AES beam-search frame step spends its time on many small HBM-bound XLA
ops: the joint's [BK, V] logits/log-probs round-trip HBM three times per
frame and the candidate top-k lowers to full row sorts inside the while
loop (profiled: the two sorts alone are ~10% of decode, the joint/softmax
materializations more). This kernel computes, entirely in VMEM per grid
block of utterances:

    d       = LayerNorm(feat @ W_dec + b_dec)
    logits  = relu(enc_proj + d) @ W_out + b_out        (reference joint,
              espresso speech_transformer_transducer_base.py:279-299)
    lp      = log_softmax(logits)
    blank_lp[b*K+k]          -> merge scores for the blank pool
    top-(K+beta) of (scores + lp) over the K*V label candidates per
    utterance (blank/eos masked), via an iterative max-and-mask loop —
    exact values, no sort, never materializing [B, K*V] in HBM.

Mosaic constraints shape the implementation: no vector reshapes (sublane/
lane shape casts are unsupported), so scores arrive pre-flattened [BK, 1],
the blank column is a static slice, and the per-utterance top-k statically
unrolls over the block's utterances on [K, V] sub-tiles.

Used by TransducerBeamSearchDecoder on the TPU path, with or without
shallow LM fusion (the LM term rides in as an additive label-bias tile and
is renormalized in-kernel); the pure-jnp path remains for CPU/odd shapes
and is the numerical reference in tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.ops.backend import backend_is_tpu

NEG_INF = -1.0e9


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16 MB core VMEM


def _kernel_vmem_bytes(
    bb: int, K: int, V: int, J: int, H: int, has_bias: bool = False
) -> int:
    rows = bb * K
    weights = (H * J + J * V + 3 * J + V) * 4  # held as f32 worst case
    acts = rows * (J + H + 1) * 4
    # logits/lp/masked/work live as [rows, V] f32 (compiler may overlap;
    # budget the worst case); the LM label-bias tile adds one more
    wide = (5 if has_bias else 4) * rows * V * 4
    return weights + acts + wide


def _pick_bb(
    B: int,
    K: int,
    V: Optional[int] = None,
    J: Optional[int] = None,
    H: Optional[int] = None,
    has_bias: bool = False,
) -> Optional[int]:
    for bb in (16, 8, 4, 2, 1):
        if B % bb != 0:
            continue
        if V is not None and (
            _kernel_vmem_bytes(bb, K, V, J, H, has_bias) > _VMEM_BUDGET
        ):
            continue
        return bb
    return None


def supports_fused_joint_topk(
    B: int, K: int, V: int, J: int, H: int, has_bias: bool = False
) -> bool:
    """Shape gate for the kernel: lane alignment, batch tiling, and a VMEM
    budget so large-vocab joints fall back to the jnp path instead of
    failing Mosaic compilation. ``has_bias`` sizes in the LM shallow-fusion
    label-bias tile."""
    return (
        _pick_bb(B, K, V, J, H, has_bias) is not None
        and V % 128 == 0
        and J % 128 == 0
        and H % 128 == 0
        and backend_is_tpu()
    )


def fused_joint_topk(
    enc_t: jnp.ndarray,  # [B*K, J] bf16/f32 (encoder side, LN applied)
    feat: jnp.ndarray,  # [B*K, H] prediction-net features
    scores: jnp.ndarray,  # [B, K] f32 current beam scores
    w_dec: jnp.ndarray,  # [H, J]
    b_dec: jnp.ndarray,  # [J]
    ln_scale: jnp.ndarray,  # [J]
    ln_bias: jnp.ndarray,  # [J]
    w_out: jnp.ndarray,  # [J, V]
    b_out: jnp.ndarray,  # [V]
    K: int,
    n_cand: int,
    blank: int = 0,
    eos: Optional[int] = None,
    fold_eos_into_blank: bool = False,
    label_bias: Optional[jnp.ndarray] = None,  # [B*K, V] f32
    interpret: bool = False,
    row_level: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (blank_lp [B, K] f32, top_vals [B, n_cand] f32 of
    scores+label_lp sorted descending, top_idx [B, n_cand] i32 flat indices
    into [K*V]).

    ``label_bias`` is an additive per-row vocab bias folded into the label
    candidates only (blank_lp stays pure joint) — the LM shallow-fusion
    term, pre-shifted to model vocab indices and pre-scaled by lm_weight
    (reference transducer_base_decoder.py:85-104). The biased label probs
    are renormalized per row so the total non-blank mass is unchanged (the
    reference's log_scaling_factor,
    transducer_beam_search_decoder.py:311-322); with a bias the return is a
    4-tuple whose last element is that factor [B, K] f32 (reused by the
    prefix merge).

    ``row_level=True`` skips the final cross-row top-k and returns
    (blank_lp, row_vals [B, K, n_cand], row_flat [B, K, n_cand][, factor])
    instead. The per-row candidate SET is independent of the beam scores
    (a row's score is a per-row constant added to every candidate), so a
    caller that later shifts a row's score (the prefix merge) adds the
    delta to row_vals and calls ``rows_topk`` — no second kernel run."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BK, J = enc_t.shape
    H = feat.shape[1]
    V = w_out.shape[1]
    B = scores.shape[0]
    assert BK == B * K
    bb = _pick_bb(B, K, V, J, H, label_bias is not None)
    assert bb is not None, "shape over VMEM budget — use the jnp path"
    rows = bb * K
    op_dtype = jnp.result_type(enc_t.dtype, feat.dtype, w_out.dtype)

    def kernel(enc_ref, feat_ref, sc_ref, wd_ref, bd_ref, lns_ref, lnb_ref,
               wo_ref, bo_ref, *rest):
        if label_bias is not None:
            bias_ref, blank_ref, vals_ref, idx_ref, factor_ref = rest
        else:
            blank_ref, vals_ref, idx_ref = rest
        # MXU operands stay in the model's compute dtype with f32
        # accumulation. In production decode everything is bf16 — the MXU's
        # native full-rate mode (an unconditional f32 upcast ran the two
        # dots at the ~4x slower f32 systolic rate and dominated the
        # kernel); with f32 inputs (unit tests) the math is exact f32.
        d = jax.lax.dot_general(
            feat_ref[:].astype(op_dtype),
            wd_ref[:].astype(op_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bd_ref[:].astype(jnp.float32)
        mu = jnp.mean(d, axis=1, keepdims=True)
        var = jnp.mean((d - mu) ** 2, axis=1, keepdims=True)
        d = (d - mu) * jax.lax.rsqrt(var + 1e-6)
        d = d * lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
        h = jnp.maximum(enc_ref[:].astype(jnp.float32) + d, 0.0)
        # under bf16 h is rounded for the vocab dot — matches the jnp
        # fallback path (the whole model runs bf16); accumulator stays f32
        logits = jax.lax.dot_general(
            h.astype(op_dtype),
            wo_ref[:].astype(op_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[:].astype(jnp.float32)  # [rows, V]
        m = jnp.max(logits, axis=1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))
        lp = logits - lse  # [rows, V] log-probs
        blank_col = lp[:, blank : blank + 1]  # [rows, 1]
        if fold_eos_into_blank and eos is not None:
            blank_col = jnp.logaddexp(blank_col, lp[:, eos : eos + 1])
        blank_ref[:] = blank_col
        # label candidates: scores + lp, blank (and eos) masked out
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, V), 1)
        masked = jnp.where(cols == blank, NEG_INF, lp)
        if fold_eos_into_blank and eos is not None:
            masked = jnp.where(cols == eos, NEG_INF, masked)
        if label_bias is not None:
            # LM shallow fusion: additive, labels only (blank_lp above is
            # already stored un-biased), renormalized so the total
            # non-blank probability mass is unchanged (the reference's
            # log_scaling_factor, transducer_beam_search_decoder.py:311-322)
            fused = masked + bias_ref[:]
            m1 = jnp.max(masked, axis=1, keepdims=True)
            s1 = m1 + jnp.log(
                jnp.sum(jnp.exp(masked - m1), axis=1, keepdims=True)
            )
            m2 = jnp.max(fused, axis=1, keepdims=True)
            s2 = m2 + jnp.log(
                jnp.sum(jnp.exp(fused - m2), axis=1, keepdims=True)
            )
            factor_ref[:] = s1 - s2
            masked = fused + (s1 - s2)
        work = sc_ref[:].astype(jnp.float32) + masked  # [rows, V]
        # vectorized per-ROW exact top-n_cand (lane reduces, no sort, no
        # scalar serialization); the exact per-utterance top-n_cand is a
        # tiny [K*n_cand]-wide top_k outside the kernel — any utterance
        # top-n candidate is necessarily within its row's top-n
        for c in range(n_cand):
            best = jnp.max(work, axis=1, keepdims=True)  # [rows, 1]
            first = jnp.min(
                jnp.where(work == best, cols, V), axis=1, keepdims=True
            )
            vals_ref[:, c : c + 1] = best
            idx_ref[:, c : c + 1] = first
            # mask BELOW NEG_INF so already-picked columns lose ties
            # against untouched NEG_INF columns (distinct indices, like
            # lax.top_k)
            work = jnp.where(cols == first, 2.0 * NEG_INF, work)

    grid = (B // bb,)
    in_specs = [
        pl.BlockSpec((rows, J), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, J), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, J), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, J), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, J), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((J, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, V), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [
        enc_t,
        feat,
        scores.astype(jnp.float32).reshape(BK, 1),
        w_dec,
        b_dec.reshape(1, -1),
        ln_scale.reshape(1, -1),
        ln_bias.reshape(1, -1),
        w_out,
        b_out.reshape(1, -1),
    ]
    out_specs = [
        pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (rows, n_cand), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (rows, n_cand), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((BK, 1), jnp.float32),
        jax.ShapeDtypeStruct((BK, n_cand), jnp.float32),
        jax.ShapeDtypeStruct((BK, n_cand), jnp.int32),
    ]
    if label_bias is not None:
        in_specs.append(
            pl.BlockSpec((rows, V), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(label_bias.astype(jnp.float32))
        # per-row LM renormalization factor (see kernel): the prefix merge
        # reuses it per source row instead of re-materializing [BK, V]
        out_specs.append(
            pl.BlockSpec((rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((BK, 1), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*inputs)
    blank_flat, row_vals, row_idx = out[0], out[1], out[2]
    row_flat = (
        jnp.arange(BK, dtype=jnp.int32).reshape(B, K, 1) % K * V
        + row_idx.reshape(B, K, n_cand)
    )
    row_vals = row_vals.reshape(B, K, n_cand)
    if row_level:
        if label_bias is not None:
            return blank_flat.reshape(B, K), row_vals, row_flat, out[
                3
            ].reshape(B, K)
        return blank_flat.reshape(B, K), row_vals, row_flat
    vals, idx = rows_topk(row_vals, row_flat, n_cand)
    if label_bias is not None:
        return blank_flat.reshape(B, K), vals, idx, out[3].reshape(B, K)
    return blank_flat.reshape(B, K), vals, idx


def rows_topk(
    row_vals: jnp.ndarray,  # [B, K, n] per-row candidate values
    row_flat: jnp.ndarray,  # [B, K, n] flat indices into [K*V]
    n_cand: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-utterance top-n_cand from per-row winners: a tiny top_k
    over K*n_cand values instead of a K*V sort inside the decode loop (any
    utterance top-n candidate is necessarily within its row's top-n)."""
    B = row_vals.shape[0]
    vals, pos = jax.lax.top_k(row_vals.reshape(B, -1), n_cand)
    idx = jnp.take_along_axis(row_flat.reshape(B, -1), pos, axis=1)
    return vals, idx


def aes_backtrace(
    active: jnp.ndarray,  # [T, B, 1] int32 (1 = frame within src length)
    fp: jnp.ndarray,  # [T, R, B, K] int32 from-pool flags per merge round
    msrc: jnp.ndarray,  # [T, R, B, K] int32 merge source slots
    esrc: jnp.ndarray,  # [T, E, B, K] int32 expansion source beams
    etok: jnp.ndarray,  # [T, E, B, K] int32 expansion tokens
    order: jnp.ndarray,  # [B, K] int32 initial (sorted) slots
    n_exp: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-backtrace Pallas kernel: walks the per-frame merge/expansion
    backpointers in reverse in ONE kernel (grid over frames, slot state in
    VMEM scratch), replacing a lax.scan whose ~30 tiny [B, K] ops per
    iteration were pure per-op overhead (~43 ms of the decode wall).
    K-way gathers become K-select chains — K is the beam width, so each is
    a handful of VPU selects on one tile. Returns (toks [T, E, B, K] i32,
    valid [T, E, B, K] i32) in the same (r = n_exp..1) round order as the
    scan it replaces."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, R, B, K = fp.shape
    E = esrc.shape[1]
    assert R == n_exp + 1 and E == max(n_exp, 1)

    def gather_k(tab, idx):
        out = jnp.zeros_like(tab)
        for s in range(K):
            out = jnp.where(idx == s, tab[:, s : s + 1], out)
        return out

    def kernel(act_ref, fp_ref, msrc_ref, esrc_ref, etok_ref, order_ref,
               toks_ref, valid_ref, slot_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            slot_scr[:] = order_ref[:]

        slot = slot_scr[:]
        act = act_ref[0]  # [B, 1]
        cont = jnp.broadcast_to(act > 0, (B, K))
        exit_level = jnp.full((B, K), -1, jnp.int32)
        exit_slot = slot
        cur = slot
        for j in range(n_exp, -1, -1):
            f = gather_k(fp_ref[0, j], cur) > 0
            src = gather_k(msrc_ref[0, j], cur)
            newly = cont & ~f
            exit_level = jnp.where(newly, j, exit_level)
            exit_slot = jnp.where(newly, src, exit_slot)
            cur = jnp.where(cont & f, src, cur)
            cont = cont & f
        s = exit_slot
        for idx_r, r in enumerate(range(n_exp, 0, -1)):
            m = exit_level >= r
            tok = gather_k(etok_ref[0, r - 1], s)
            src = gather_k(esrc_ref[0, r - 1], s)
            toks_ref[0, idx_r] = jnp.where(m, tok, 0)
            valid_ref[0, idx_r] = m.astype(jnp.int32)
            s = jnp.where(m, src, s)
        slot_scr[:] = s

    rev = lambda i: (T - 1 - i, 0, 0, 0)
    toks, valid = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 1), lambda i: (T - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, B, K), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, B, K), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, B, K), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, B, K), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, E, B, K), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, B, K), rev, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, E, B, K), jnp.int32),
            jax.ShapeDtypeStruct((T, E, B, K), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((B, K), jnp.int32)],
        interpret=interpret,
    )(active, fp, msrc, esrc, etok, order)
    return toks, valid


def _lstm_step_vmem_bytes(rows: int, H: int, L: int) -> int:
    weights = 2 * L * H * 4 * H * 2  # w_ih + w_hh, ALL layers resident, bf16
    io = rows * H * (2 + 4 * L * 2)  # x + packed-S in/out blocks (bf16)
    live = rows * H * (
        4 * 2 * L  # gathered S (f32)
        + 16  # pre f32 [rows, 4H]
        + 4 + 2  # gates + xc
    )
    return weights + io + live + rows * rows * 2


def _pick_lstm_bb(B: int, K: int, H: int, L: int) -> Optional[int]:
    for bb in (32, 16, 8, 4, 2, 1):
        if B % bb != 0:
            continue
        if _lstm_step_vmem_bytes(bb * K, H, L) > _VMEM_BUDGET:
            continue
        return bb
    return None


def supports_lstm_step_reorder(
    B: int,
    K: int,
    H: int,
    E: int,
    L: int,
    dtype=None,
    require_tpu: bool = True,
) -> bool:
    """Shape gate for the fused decode LSTM step: the input embedding must
    match the hidden width (true for the transducer pred-net and, after
    gate-padding, the LSTM LMs), H lane-aligned, and the WHOLE weight
    stack + one block's activations within the VMEM budget — the kernel
    keeps all weights resident across the batch grid (the streaming
    variant re-fetched ~8 MB of weights per batch block and was
    DMA-bound). Big LMs (e.g. 3x1024: 50 MB of weights) fall back to the
    XLA path.

    ``dtype`` is the decode carry dtype: the kernel computes its recurrence
    in bf16, which is exact vs the jnp path only when the model itself runs
    bf16. f32 carries stay on the jnp path (f32 recurrence) unless
    ``ESPRESSO_LSTM_KERNEL_F32=1`` explicitly accepts the per-step bf16
    rounding. ``require_tpu=False`` (interpret mode) skips the
    backend/lane-alignment/dtype checks — parity tests opt in knowingly —
    but keeps the structural (E == H) and VMEM gates, so an over-budget
    weight stack falls back to the jnp path instead of tripping the
    kernel's bb assert.
    """
    import os

    if require_tpu:
        if dtype is not None and jnp.dtype(dtype) != jnp.bfloat16:
            if os.environ.get("ESPRESSO_LSTM_KERNEL_F32", "0") != "1":
                return False
        if H % 128 != 0 or not backend_is_tpu():
            return False
    return E == H and _pick_lstm_bb(B, K, H, L) is not None


def pack_lstm_state(h: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """[L, BK, H] h/c -> packed [BK, 2LH] column blocks [h_0..h_{L-1} |
    c_0..c_{L-1}]. 2-D packed state has one canonical layout everywhere
    (the 3-D [L, BK, H] carries forced ~30 µs layout copies per kernel
    call and per scan iteration at B=256 — measured 28 ms/decode)."""
    L, BK, H = h.shape
    return jnp.concatenate(
        [
            jnp.moveaxis(h, 0, 1).reshape(BK, L * H),
            jnp.moveaxis(c, 0, 1).reshape(BK, L * H),
        ],
        axis=1,
    )


def unpack_lstm_state(S: jnp.ndarray, L: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`pack_lstm_state`."""
    BK, C = S.shape
    H = C // (2 * L)
    h = jnp.moveaxis(S[:, : L * H].reshape(BK, L, H), 1, 0)
    c = jnp.moveaxis(S[:, L * H :].reshape(BK, L, H), 1, 0)
    return h, c


def lstm_feat(S: jnp.ndarray, L: int) -> jnp.ndarray:
    """Top-layer hidden slice of the packed state (the pred-net feature)."""
    H = S.shape[1] // (2 * L)
    return jax.lax.slice_in_dim(S, (L - 1) * H, L * H, axis=1)


def lstm_step_reorder(
    x: jnp.ndarray,  # [BK, H] embedded input tokens (dest-row order)
    S: jnp.ndarray,  # [BK, 2LH] packed state (pack_lstm_state)
    src: jnp.ndarray,  # [BK] int32 global source-row index (same utterance)
    live: jnp.ndarray,  # [BK] bool — rows that advance; dead rows keep the
    #                     gathered (reordered) state
    w_ih: jnp.ndarray,  # [L, H, 4H] input-side gate kernels
    b_ih: jnp.ndarray,  # [L, 4H] input-side biases
    w_hh: jnp.ndarray,  # [L, H, 4H] recurrent gate kernels (bias-free)
    B: int,
    K: int,
    interpret: bool = False,
    bb: Optional[int] = None,
) -> jnp.ndarray:
    """Fused beam-reorder + multi-layer LSTM decode step.

    Computes, per destination row r with source row s = src[r], over the
    packed state S = [h_0..h_{L-1} | c_0..c_{L-1}] (pack_lstm_state):

        h_g, c_g = h[:, s], c[:, s]                 (the beam reorder)
        x_0 = x[r]
        for l in layers:
            pre = x_l @ w_ih[l] + b_ih[l] + h_g[l] @ w_hh[l]
            h_new[l], c_new[l] = lstm_gates(pre, h_g[l], c_g[l])
            x_{l+1} = h_new[l]
        out[l] = where(live[r], (h_new[l], c_new[l]), (h_g[l], c_g[l]))

    matching the jnp path in decode/transducer_beam.py (reorder ->
    pred_step -> live mask) and the LM advance for LSTM LMs. The reorder
    rides as a block-local one-hot matmul (rows only ever source within
    their own utterance's K beams, so every gather stays inside the grid's
    utterance block); the gathered carries and the [BK, 4H] preactivations
    never touch HBM — the XLA path moved ~60 MB of intermediate state per
    expansion round through HBM and paid ~15 ops of sequential launch
    latency inside the scan. The 2-D packed state keeps the carry in the
    canonical {1,0} layout end to end: the [L, BK, H] interface forced XLA
    to insert layout copies (≈28 ms/decode at the flagship point) at the
    kernel and while-loop boundaries.

    Grid: (B/bb utterance blocks,) with the FULL weight stack resident in
    VMEM — the index maps for the weights are constant, so Pallas DMAs
    them exactly once per call (a layer/gate-streaming variant re-fetched
    ~8 MB of weights per batch block and was DMA-bound, no faster than
    XLA). Gate order (i, f, g, o) matches modules/lstm.lstm_gates.

    Returns the advanced packed state [BK, 2LH] in the carry dtype; the
    caller reads the top-layer features as lstm_feat(S, L) (the pred-net
    invariant exp_feat == h[-1] — see transducer_beam).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = w_ih.shape[0]
    BK, C = S.shape
    H = C // (2 * L)
    assert BK == B * K and x.shape == (BK, H) and C == 2 * L * H
    assert w_ih.shape == (L, H, 4 * H) and w_hh.shape == (L, H, 4 * H)
    if bb is None:
        bb = _pick_lstm_bb(B, K, H, L)
    assert bb is not None, "shape over VMEM budget — use the jnp path"
    rows = bb * K

    # block-local source index: src rows always live in the same utterance
    # block (src = b*K + beam, blocks are whole utterances)
    src_local = (src - (jnp.arange(BK, dtype=jnp.int32) // rows) * rows)
    src_local = src_local.astype(jnp.int32).reshape(BK, 1)
    live_i = live.astype(jnp.int32).reshape(BK, 1)

    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def kernel(x_ref, srcl_ref, live_ref, s_ref, wih_ref, bih_ref,
               whh_ref, so_ref):
        dn = (((1,), (0,)), ((), ()))
        # beam reorder as a one-hot matmul — exact in bf16 (every output
        # row copies exactly one input row), full-rate MXU; ONE matmul
        # gathers every layer's h and c at once
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        P = (cols == srcl_ref[:]).astype(bf16)
        alive = live_ref[:] > 0  # [rows, 1]
        Sg = jax.lax.dot_general(
            P, s_ref[:].astype(bf16), dn, preferred_element_type=f32
        )
        xc = x_ref[:].astype(bf16)
        for l in range(L):
            hg = Sg[:, l * H : (l + 1) * H]
            cg = Sg[:, (L + l) * H : (L + l + 1) * H]
            # bf16 operands + f32 accumulation: full-rate MXU, at least
            # the precision of the jnp path (whose bf16 dots round)
            pre = (
                jax.lax.dot_general(
                    xc, wih_ref[l].astype(bf16), dn,
                    preferred_element_type=f32,
                )
                + jax.lax.dot_general(
                    hg.astype(bf16), whh_ref[l].astype(bf16), dn,
                    preferred_element_type=f32,
                )
                + bih_ref[l].astype(f32)
            )
            # gate nonlinearities in bf16 (the jnp path's dtype): halves
            # the VPU transcendental cost, which otherwise dominates the
            # kernel (~0.3 ms/call in f32 vs ~0.1 ms of MXU work). Manual
            # sigmoid/tanh: jax.nn.sigmoid/jnp.tanh on bf16 emit an f32
            # scalar vector.broadcast Mosaic rejects.
            def _sig(v):
                return 1.0 / (1.0 + jnp.exp(-v))

            def _tanh(v):
                return 2.0 / (1.0 + jnp.exp(-2.0 * v)) - 1.0

            i_g = _sig(pre[:, 0 * H : 1 * H].astype(bf16))
            f_g = _sig(pre[:, 1 * H : 2 * H].astype(bf16))
            g_g = _tanh(pre[:, 2 * H : 3 * H].astype(bf16))
            o_g = _sig(pre[:, 3 * H : 4 * H].astype(bf16))
            hgb = hg.astype(bf16)
            cgb = cg.astype(bf16)
            c_new = f_g * cgb + i_g * g_g
            h_new = o_g * _tanh(c_new)
            so_ref[:, l * H : (l + 1) * H] = jnp.where(
                alive, h_new, hgb
            ).astype(so_ref.dtype)
            so_ref[:, (L + l) * H : (L + l + 1) * H] = jnp.where(
                alive, c_new, cgb
            ).astype(so_ref.dtype)
            # next layer's input is the RAW new hidden (the jnp path masks
            # outputs only — dead rows still feed their computed hidden up)
            xc = h_new.astype(bf16)

    grid = (B // bb,)
    full_w = lambda b: (0, 0, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, H), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, 4 * H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 4 * H), full_w, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, H, 4 * H), full_w, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BK, C), S.dtype),
        interpret=interpret,
    )(
        x,
        src_local,
        live_i,
        S,
        w_ih,
        b_ih.reshape(L, 1, 4 * H),
        w_hh,
    )
    return out


def prep_lstm_kernel_inputs(params) -> Optional[dict]:
    """Extract and gate-pad an LSTM decoder cell stack (flax subtree with
    ``embed_tokens`` / ``cell{i}_ih`` / ``cell{i}_hh``) for
    ``lstm_step_reorder``.

    The kernel wants square [Hp, 4Hp] gate kernels with Hp lane-aligned and
    the embedding width equal to Hp. Zero-padding is EXACT for LSTM cells:
    padded gate preactivations are 0 (all contributing weights and biases
    are 0), so i = f = o = sigmoid(0), g = tanh(0) = 0 and a padded channel
    evolves as c' = 0.5·c, h' = 0.5·tanh(c') — identically 0 when the
    padded state starts at 0 (the caller pads carries with zeros).

    Returns dict(embed [V, Hp], w_ih/b_ih [L, Hp·4Hp], w_hh, H, Hp) or
    None when the subtree doesn't look like a plain LSTM stack."""
    try:
        n = 0
        while f"cell{n}_ih" in params:
            n += 1
        if n == 0 or "embed_tokens" not in params:
            return None
        w_hh = [params[f"cell{i}_hh"]["kernel"] for i in range(n)]
        w_ih = [params[f"cell{i}_ih"]["kernel"] for i in range(n)]
        b_ih = [params[f"cell{i}_ih"]["bias"] for i in range(n)]
        emb = params["embed_tokens"]["embedding"]
    except (KeyError, TypeError):
        return None
    H = int(w_hh[0].shape[0])
    E = int(emb.shape[1])
    if any(k.shape != (H, 4 * H) for k in w_hh):
        return None
    if w_ih[0].shape != (E, 4 * H):
        return None
    if any(k.shape != (H, 4 * H) for k in w_ih[1:]):
        return None
    Hp = -(-H // 128) * 128
    if E > Hp:
        return None
    dt = w_hh[0].dtype
    if Hp == H and E == H:
        return dict(
            embed=emb,
            w_ih=jnp.stack(w_ih),
            b_ih=jnp.stack(b_ih),
            w_hh=jnp.stack(w_hh),
            H=H,
            Hp=Hp,
        )

    def pad_gates(w_list):
        out = jnp.zeros((n, Hp, 4 * Hp), dt)
        for i, w in enumerate(w_list):
            for g in range(4):
                out = out.at[
                    i, : w.shape[0], g * Hp : g * Hp + H
                ].set(w[:, g * H : (g + 1) * H].astype(dt))
        return out

    b = jnp.zeros((n, 4 * Hp), dt)
    for i, bv in enumerate(b_ih):
        for g in range(4):
            b = b.at[i, g * Hp : g * Hp + H].set(
                bv[g * H : (g + 1) * H].astype(dt)
            )
    emb_p = jnp.zeros((emb.shape[0], Hp), emb.dtype).at[:, :E].set(emb)
    return dict(
        embed=emb_p, w_ih=pad_gates(w_ih), b_ih=b, w_hh=pad_gates(w_hh),
        H=H, Hp=Hp,
    )


def aes_merge(
    pool_scores: jnp.ndarray,  # [B, K] f32
    blank_scores: jnp.ndarray,  # [B, K] f32 (exp_scores + blank log-prob)
    pool_hash: jnp.ndarray,  # [B, K] i32
    exp_hash: jnp.ndarray,  # [B, K] i32
    pool_ver: jnp.ndarray,  # [B, K] i32
    pool_slot: jnp.ndarray,  # [B, K] i32
    round_j: int,
    interpret: bool = False,
):
    """One AES blank-merge round as a single Pallas kernel: exact duplicate
    logaddexp over the 2K candidate pool (rolling-hash equality), stable
    top-K, and the pool bookkeeping (hash/version/slot gathers + backtrace
    emissions). Replaces ~25 tiny [B, K]-sized XLA ops per merge (3 merges
    per frame) whose launch overhead dominated the remaining scan time.
    All loops are static (2K dedup columns, K selection iterations, 2K-way
    select-gathers) on one [B, 2K] VMEM tile.

    Returns (top_pool [B,K] f32, new_hash, new_ver, new_slot, from_pool
    [B,K] i32, src_slot [B,K] i32) with tie behavior identical to the jnp
    path (first-occurrence/stable).

    Mosaic layout constraints shape the implementation: at narrow lane
    widths (2K << 128) the ApplyVectorLayout pass miscompiles lane-dim
    strided slices/concats (libtpu check failure ``limits[i] <= dim(i)``
    in vector_extract_strided_slice), so the pool/expansion concats happen
    HOST-side (XLA), every column extract is a one-hot mask-reduce, and
    each output is accumulated full-width in registers and stored exactly
    once — the kernel contains no lane-dim slicing at all."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K = pool_scores.shape
    K2 = 2 * K

    # host-side (XLA) concats: the kernel sees pre-merged [B, 2K] tables.
    # slot table for expansion columns is the column's own source slot;
    # version table for expansion columns is the current round index.
    merged_in = jnp.concatenate(
        [pool_scores.astype(jnp.float32), blank_scores.astype(jnp.float32)],
        axis=1,
    )
    hashes_in = jnp.concatenate(
        [pool_hash.astype(jnp.int32), exp_hash.astype(jnp.int32)], axis=1
    )
    exp_cols = jnp.arange(K, dtype=jnp.int32)[None, :].repeat(B, 0)
    ver_in = jnp.concatenate(
        [pool_ver.astype(jnp.int32), jnp.full((B, K), round_j, jnp.int32)],
        axis=1,
    )
    slot_in = jnp.concatenate([pool_slot.astype(jnp.int32), exp_cols], axis=1)

    def kernel(ms_ref, mh_ref, mv_ref, msl_ref,
               top_ref, nh_ref, nv_ref, ns_ref, fp_ref, ss_ref):
        merged = ms_ref[:]  # [B, 2K]
        hashes = mh_ref[:]
        vers = mv_ref[:]
        slots = msl_ref[:]
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, K2), 1)
        live = merged > NEG_INF / 2
        eff = jnp.where(live, hashes, -(cols + 1))

        def col_val(tab, colmask):  # one-hot extract -> [B, 1]
            return jnp.sum(jnp.where(colmask, tab, 0), axis=1, keepdims=True)

        # exact duplicate merge: for each column, logaddexp all equal-hash
        # scores; only the first occurrence keeps the combined score
        dedup = jnp.full((B, K2), NEG_INF, jnp.float32)
        for c in range(K2):
            colmask = cols == c
            eq = eff == col_val(eff, colmask)
            vals = jnp.where(eq, merged, NEG_INF)
            m = jnp.max(vals, axis=1, keepdims=True)
            comb = m + jnp.log(
                jnp.sum(jnp.exp(vals - m), axis=1, keepdims=True)
            )
            comb = jnp.where(m > NEG_INF / 2, comb, NEG_INF)
            first = jnp.min(jnp.where(eq, cols, K2), axis=1, keepdims=True)
            dedup = jnp.where(colmask & (first == c), comb, dedup)

        # stable top-K (max + first-occurrence mask); outputs accumulate
        # full-width via kcol masks and store once after the loop
        kcols = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
        top_acc = jnp.full((B, K), NEG_INF, jnp.float32)
        fp_acc = jnp.zeros((B, K), jnp.int32)
        ss_acc = jnp.zeros((B, K), jnp.int32)
        nh_acc = jnp.zeros((B, K), jnp.int32)
        nv_acc = jnp.zeros((B, K), jnp.int32)
        ns_acc = jnp.zeros((B, K), jnp.int32)
        work = dedup
        for k in range(K):
            best = jnp.max(work, axis=1, keepdims=True)
            col = jnp.min(
                jnp.where(work == best, cols, K2), axis=1, keepdims=True
            ).astype(jnp.int32)
            sel = cols == col  # one-hot [B, 2K]
            from_pool = (col < K).astype(jnp.int32)
            src = jnp.where(col < K, col, col - K)
            kmask = kcols == k
            top_acc = jnp.where(kmask, best, top_acc)
            fp_acc = jnp.where(kmask, from_pool, fp_acc)
            ss_acc = jnp.where(kmask, src, ss_acc)
            nh_acc = jnp.where(kmask, col_val(hashes, sel), nh_acc)
            nv_acc = jnp.where(kmask, col_val(vers, sel), nv_acc)
            ns_acc = jnp.where(kmask, col_val(slots, sel), ns_acc)
            # strictly-below mask keeps picked columns out of later ties
            work = jnp.where(sel, 2.0 * NEG_INF, work)
        top_ref[:] = top_acc
        fp_ref[:] = fp_acc
        ss_ref[:] = ss_acc
        nh_ref[:] = nh_acc
        nv_ref[:] = nv_acc
        ns_ref[:] = ns_acc

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(4)],
        out_specs=tuple(vspec() for _ in range(6)),
        out_shape=(
            jax.ShapeDtypeStruct((B, K), jnp.float32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ),
        interpret=interpret,
    )(merged_in, hashes_in, ver_in, slot_in)
    return outs
