"""Batched transducer beam search — Adaptive Expansion Search (AES).

Rebuild of espresso/tools/transducer_beam_search_decoder.py:21 (modified-AES,
ieeexplore 9250505 / ESPnet lineage): per encoder frame, hypotheses expand
labels for at most ``max_num_expansions_per_step`` rounds; candidates are
pruned by value (``expansion_gamma`` below the round's best) and by count
(beam + ``expansion_beta``); blank-scored hypotheses accumulate into the
next frame's beam.

TPU re-design (replaces the reference's per-utterance Python loop
:197-486 and tensor Hypotheses utilities transducer_utils.py:17-637):
every utterance and every hypothesis advances in lockstep inside one
``lax.scan`` over frames with a statically unrolled expansion loop;
hypothesis state is fixed-shape arrays (scores [B,K], prediction-net
carries) and all selection is topk + gather. Token sequences are NOT
materialized in the forward scan: each frame emits backpointers (merge
source + expansion source/token, a few [B,K] int arrays) and a second,
reverse device scan reconstructs the winning sequences — this keeps
multi-megabyte token buffers out of the scan carry (HBM traffic was the
decode bottleneck, not FLOPs) and transfers only compact int16 tokens
over the slow host link. Identical token
sequences in the next-frame pool are merged exactly: a rolling sequence
hash rides the hypothesis state and equal-hash candidates logaddexp
their scores (the reference prefix merge's equal-sequence case).

Proper-prefix merging (reference ``prefix_search_and_merge``,
transducer_beam_search_decoder.py:273,:465-486 via ``is_prefix_tensorized``
transducer_utils.py:723): at each frame start, for every hypothesis pair
where A is a proper prefix of B with extension length <= ``prefix_alpha``,
the extension tokens are scored with the current frame's joint and A's
probability mass logaddexp'd into B. The fixed-shape formulation detects
prefix pairs by inverting the rolling hash (31 is odd, hence invertible
mod 2^32): the depth-d ancestor hash of each hypothesis is compared
against every other hypothesis' hash together with an exact length match.
Extension scoring reuses the frame's round-0 joint log-probs for the
first extension token (the prefix hypothesis' prediction feature IS the
longer hypothesis' feature at that position — the prediction net is
deterministic in the token prefix) and a ring buffer of the last
``prefix_alpha - 1`` prediction features for deeper extensions. Unlike
the reference's unbounded default, extension depth is statically bounded
by ``prefix_alpha`` (the reference itself advises alpha=1).

Optional shallow LM fusion with blank-less index shifting is applied on
label expansions only (reference transducer_base_decoder.py:85-104), with
the reference's mass-preserving renormalization: after adding the weighted
LM log-probs, the non-blank columns are shifted by a per-row factor so the
total non-blank probability mass is unchanged
(transducer_beam_search_decoder.py:311-322); the same factor is applied
per extension token inside the prefix merge (:516-545, :565-594). The
fused Pallas kernel computes the fusion + factor in VMEM (the LM term
enters as a pre-shifted additive bias tile), so LM-fused decode keeps the
fast path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e9
# multiplicative inverse of the rolling-hash base 31 mod 2^32 (int32 wrap):
# parent_hash = (hash - (tok + 1)) * INV31
INV31 = np.int32(-1108378657)


def _exact_topk_rows(x: jnp.ndarray, k: int, block: int = 128):
    """Exact top-k along wide rows via block-max hierarchy.

    XLA lowers ``lax.top_k`` over wide rows inside this decoder's scan to a
    full stable sort (no TopK custom-call rewrite inside while bodies) —
    ~1.15 ms per call at [256, 10240] on v5e. Instead: one block-max pass,
    top-k of the block maxes, gather those k blocks, and top-k the k·block
    survivors (~0.16 ms, 7x faster). Exact because any global top-k element
    lives in a block whose max is at least it, so its block is among the
    top-k blocks. Values match lax.top_k exactly; tie index ORDER may
    differ (selection set is identical under distinct values)."""
    B_, C = x.shape
    if C % block != 0 or C <= k * block:
        return jax.lax.top_k(x, k)
    G = C // block
    x3 = x.reshape(B_, G, block)
    bm = jnp.max(x3, axis=2)  # [B, G] — the only full pass
    _, gi = jax.lax.top_k(bm, k)  # [B, k] winning blocks
    blocks = jnp.take_along_axis(x3, gi[:, :, None], axis=1)  # [B, k, block]
    v, i2 = jax.lax.top_k(blocks.reshape(B_, k * block), k)
    gsel = jnp.take_along_axis(gi, i2 // block, axis=1)
    return v, gsel * block + (i2 % block)


def _prep_big_lm(lm_params):
    """Row-major fast path for LSTM-LM shallow fusion when the weight stack
    exceeds the fused step kernel's VMEM budget (the reference flagship LMs:
    librispeech 4x800, swbd 3x1800 — run.sh Stage 7).

    Two layout changes, both exact:

      * State is [BK, L, H] instead of the generic adapter's [L, BK, H] —
        the per-round beam reorders and the frame-end version combine become
        contiguous ROW gathers. (The axis-1 gathers XLA emits for the
        generic carry ran at ~530 GB/s and dragged a [L,BK,H]<->[BK,L,H]
        layout copy behind every one of them — together the largest
        LM-fusion cost after the gate matmuls themselves.)
      * The layer-0 input projection folds into the embedding table:
        (E @ W_ih0 + b0)[tok] == E[tok] @ W_ih0 + b0 row-exactly, so one
        [V, 4H] lookup replaces a per-step [BK, E] x [E, 4H] matmul.

    Semantics match ``scanned_decoder_step`` in LM mode (no encoder, no
    dropout; ``decoder_residual`` cannot be set through LSTMLMConfig, see
    models/lstm_lm._to_decoder_cfg). Returns None if the params don't look
    like a plain LSTM decoder stack.
    """
    try:
        n_lyr = 0
        while f"cell{n_lyr}_ih" in lm_params:
            n_lyr += 1
        embed = lm_params["embed_tokens"]["embedding"]
        kih = [lm_params[f"cell{i}_ih"]["kernel"] for i in range(n_lyr)]
        bih = [lm_params[f"cell{i}_ih"]["bias"] for i in range(n_lyr)]
        khh = [lm_params[f"cell{i}_hh"]["kernel"] for i in range(n_lyr)]
    except (KeyError, TypeError):
        return None
    if n_lyr == 0 or embed.ndim != 2 or embed.shape[1] != kih[0].shape[0]:
        return None
    H = khh[0].shape[0]
    if any(k.shape != (H, 4 * H) for k in khh):
        return None
    if any(k.shape != (H, 4 * H) for k in kih[1:]) or kih[0].shape[1] != 4 * H:
        return None
    embed_pre = embed @ kih[0] + bih[0]  # [V_lm, 4H]
    return dict(
        embed_pre=embed_pre, kih=kih[1:], bih=bih[1:], khh=khh, L=n_lyr, H=H
    )


def _big_lm_step(big, tok, h, c):
    """One LM advance on row-major state: tok [BK] (LM indices),
    h/c [BK, L, H] -> (top hidden [BK, H], h', c')."""
    from espresso_tpu.modules.lstm import lstm_gates

    pre = jnp.take(big["embed_pre"], tok, axis=0)
    hs, cs = [], []
    x = None
    for i in range(big["L"]):
        if i > 0:
            pre = x @ big["kih"][i - 1] + big["bih"][i - 1]
        p = pre + h[:, i] @ big["khh"][i]
        hi, ci = lstm_gates(p, h[:, i], c[:, i])
        hs.append(hi)
        cs.append(ci)
        x = hi
    return x, jnp.stack(hs, axis=1), jnp.stack(cs, axis=1)


class TransducerBeamSearchDecoder:
    def __init__(
        self,
        model,
        dictionary,
        beam_size: int = 10,
        expansion_beta: int = 2,
        expansion_gamma: Optional[float] = 2.3,
        max_num_expansions_per_step: int = 2,
        max_out_factor: float = 0.35,
        lm=None,
        lm_weight: float = 0.0,
        lm_variables=None,
        model_predicts_eos: bool = False,
        fused_kernel: str = "auto",  # auto | on | on+merge | off | interpret
        prefix_alpha: Optional[int] = 1,
    ):
        self.model = model
        self.dict = dictionary
        self.blank = dictionary.blank()
        self.model_predicts_eos = model_predicts_eos
        self.beam = beam_size
        self.expansion_beta = expansion_beta
        self.expansion_gamma = expansion_gamma
        self.n_exp = max_num_expansions_per_step
        self.max_out_factor = max_out_factor
        self.lm = lm
        self.lm_weight = lm_weight
        self.lm_variables = lm_variables
        self.fused_kernel = fused_kernel
        # prefix_alpha: 0 disables the proper-prefix merge; n >= 1 bounds the
        # extension depth (None = the reference's "no cap" default, which a
        # fixed-shape scan can't express — mapped to the advised depth 1)
        if prefix_alpha is None:
            prefix_alpha = 1
        assert prefix_alpha >= 0, prefix_alpha
        # prefix_alpha > 1 with LM fusion keeps a ring of the last A-1
        # cached LM log-prob rows alongside the feature ring, so extension
        # tokens at depth >= 2 get their LM term + renormalization factor
        # exactly like the reference (transducer_beam_search_decoder.py
        # :565-594); no clamping
        self.prefix_alpha = prefix_alpha
        if lm is not None:
            from espresso_tpu.decode.api import make_adapter

            # every adapter keeps per-row state ([BK] leading/batch axes,
            # incl. the transformer LM's per-row position counters), so AES
            # beams can advance the LM unevenly and the generic tree
            # reorder/select machinery applies
            self.lm_adapter = make_adapter(lm)
        else:
            self.lm_adapter = None
        self._jitted: Dict[Tuple, Any] = {}

    def _search_fn(self, T: int, L_max: int):
        assert len(self.dict) < 32768, (
            "int16 token packing assumes vocab < 32768"
        )
        model, blank, K = self.model, self.blank, self.beam
        eos = self.dict.eos()
        predicts_eos = self.model_predicts_eos
        n_exp = self.n_exp
        n_cand = K + self.expansion_beta
        gamma = self.expansion_gamma
        lm_adapter, lm_weight = self.lm_adapter, self.lm_weight
        A = self.prefix_alpha

        fused_mode = self.fused_kernel

        def run(variables, lm_variables, src_frames, src_lengths):
            from espresso_tpu.ops.decode_kernels import (
                lstm_feat,
                lstm_step_reorder,
                pack_lstm_state,
                prep_lstm_kernel_inputs,
                supports_lstm_step_reorder,
            )

            B = src_frames.shape[0]
            BK = B * K
            # fused joint+softmax+topk Pallas path: extract raw joint
            # weights once; fall back to the jnp path when the model/shape
            # doesn't fit (e.g. test stand-ins, CPU). LM shallow fusion
            # rides the kernel as an additive per-row label bias (the
            # shifted, lm_weight-scaled cached LM log-probs), so fused
            # decode survives the reference's flagship LM-fused operating
            # points (run.sh:266-290 lm_weight 0.47/0.4)
            use_fused = False
            fused_interpret = fused_mode == "interpret"
            has_lm_bias = lm_adapter is not None and lm_weight != 0.0
            if fused_mode != "off":
                try:
                    jp = variables["params"]["joint"]
                    joint_w = dict(
                        w_dec=jp["proj_dec"]["kernel"],
                        b_dec=jp["proj_dec"]["bias"],
                        ln_scale=jp["ln_dec"]["scale"],
                        ln_bias=jp["ln_dec"]["bias"],
                        w_out=jp["fc_out"]["kernel"],
                        b_out=jp["fc_out"]["bias"],
                    )
                    from espresso_tpu.ops.decode_kernels import (
                        fused_joint_topk,
                        rows_topk,
                        supports_fused_joint_topk,
                    )

                    Vf = joint_w["w_out"].shape[1]
                    Jf = joint_w["w_dec"].shape[1]
                    Hf = joint_w["w_dec"].shape[0]
                    use_fused = fused_interpret or (
                        fused_mode in ("auto", "on", "on+merge")
                        and supports_fused_joint_topk(
                            B, K, Vf, Jf, Hf, has_lm_bias
                        )
                    )
                except (KeyError, TypeError):
                    use_fused = False

            # fused beam-reorder + pred-net LSTM step (decode mega-kernel
            # phase 2): the per-round state gathers and the 4 per-step gate
            # matmuls run in one Pallas kernel — [BK, 4H] preactivations and
            # gathered carries never touch HBM
            use_pred_kernel = False
            if fused_mode != "off":
                try:
                    pp = variables["params"]["predictor"]
                    n_lyr = 0
                    while f"cell{n_lyr}_ih" in pp:
                        n_lyr += 1
                    pred_embed = pp["embed_tokens"]["embedding"]
                    kih = [
                        pp[f"cell{i}_ih"]["kernel"] for i in range(n_lyr)
                    ]
                    khh = [
                        pp[f"cell{i}_hh"]["kernel"] for i in range(n_lyr)
                    ]
                    Hp = khh[0].shape[0] if n_lyr else 0
                    shapes_ok = (
                        n_lyr >= 1
                        and pred_embed.shape[1] == Hp
                        and all(k.shape == (Hp, 4 * Hp) for k in kih)
                        and all(k.shape == (Hp, 4 * Hp) for k in khh)
                    )
                    if shapes_ok:
                        pred_w = dict(
                            w_ih=jnp.stack(kih),
                            b_ih=jnp.stack(
                                [
                                    pp[f"cell{i}_ih"]["bias"]
                                    for i in range(n_lyr)
                                ]
                            ),
                            w_hh=jnp.stack(khh),
                        )
                        # interpret mode bypasses only the backend check;
                        # the VMEM/shape/dtype gates still apply so an
                        # over-budget stack falls back to the jnp path
                        # instead of tripping the bb assert in the kernel
                        use_pred_kernel = supports_lstm_step_reorder(
                            B,
                            K,
                            Hp,
                            pred_embed.shape[1],
                            n_lyr,
                            dtype=jax.tree_util.tree_leaves(variables)[
                                0
                            ].dtype,
                            require_tpu=not fused_interpret,
                        )
                except (KeyError, TypeError):
                    use_pred_kernel = False

            # fused beam-reorder + LM LSTM step: every reference flagship
            # decode runs LM shallow fusion (run.sh:266-290), and the LM's
            # recurrent matmuls + state reorders dominate the fused-decode
            # scan. Gate-padded weights make any hidden width lane-aligned
            # (padding is exact for LSTM cells — see prep_lstm_kernel_inputs)
            use_lm_kernel = False
            lm_k = None
            lm_params = None
            is_lstm_lm = False
            if lm_adapter is not None:
                from espresso_tpu.decode.api import LMAdapter as _LSTMAdapter

                if type(lm_adapter) is _LSTMAdapter:
                    is_lstm_lm = True
                    try:
                        lm_params = lm_variables["params"]["decoder"]
                    except (KeyError, TypeError):
                        lm_params = None
            if fused_mode != "off" and is_lstm_lm and lm_params is not None:
                lm_k = prep_lstm_kernel_inputs(lm_params)
                if lm_k is not None:
                    use_lm_kernel = supports_lstm_step_reorder(
                        B,
                        K,
                        lm_k["Hp"],
                        lm_k["Hp"],
                        lm_k["w_ih"].shape[0],
                        dtype=jax.tree_util.tree_leaves(lm_variables)[
                            0
                        ].dtype,
                        require_tpu=not fused_interpret,
                    )
            # big-LM fast path: row-major state + embedding-folded layer-0
            # projection for LSTM LMs the step kernel can't hold in VMEM
            big_lm = None
            if is_lstm_lm and not use_lm_kernel and lm_params is not None:
                big_lm = _prep_big_lm(lm_params)
            use_big_lm = big_lm is not None

            def lm_logits_from_hidden(out):
                """Post-cell LM head, replicating the reference LSTM
                decoder's LM mode (models/speech_lstm._DecoderStep:175-183):
                optional additional_fc, then fc_out or the tied input
                embedding (flax Embed.attend — no bias)."""
                if "additional_fc" in lm_params:
                    out = (
                        out @ lm_params["additional_fc"]["kernel"]
                        + lm_params["additional_fc"]["bias"]
                    )
                if "fc_out" in lm_params:
                    return (
                        out @ lm_params["fc_out"]["kernel"]
                        + lm_params["fc_out"]["bias"]
                    )
                return out @ lm_params["embed_tokens"]["embedding"].T

            def lm_label_bias(exp_lm):
                """[BK, V_model] additive label bias for the fused kernel:
                the cached LM log-probs shifted right by one (blank-less
                index shift, transducer_base_decoder.py:85-104) and scaled
                by lm_weight; NEG_INF-based masking for blank and
                beyond-LM-vocab columns matches the jnp path exactly."""
                if not (use_fused and has_lm_bias):
                    return None
                _, cached_lp = exp_lm  # [BK, V_lm] f32
                width = min(Vf - 1, cached_lp.shape[-1])
                shifted = jnp.full((B * K, Vf), NEG_INF, jnp.float32)
                shifted = shifted.at[:, 1 : 1 + width].set(
                    cached_lp[:, :width]
                )
                return lm_weight * jnp.maximum(shifted, NEG_INF)
            enc = model.apply(variables, src_frames, src_lengths, method="encode")
            # hypothesis state (flattened [B*K] where it matters)
            pdtype = jax.tree_util.tree_leaves(variables)[0].dtype
            carry0 = model.apply(
                variables, BK, pdtype, method="init_pred_carry"
            )
            feat0, carry0 = model.apply(
                variables,
                jnp.full((BK,), blank, jnp.int32),
                carry0,
                method="pred_step",
            )
            if use_pred_kernel:
                # kernel-mode pred state is ONE packed 2-D matrix
                # [BK, 2*L*H] (pack_lstm_state): a single canonical layout
                # through the scan carry and the Pallas call (the 3-D
                # [L, BK, H] h/c forced XLA layout copies at both
                # boundaries), one row-gather per version at frame end,
                # and the top-layer feature is a column slice (the model
                # carry's ctx is width-0 and prev is unused by pred_step —
                # models/transducer.py:109-113 — so neither is carried)
                h0_, c0_, _ctx0, _prev0 = carry0
                pred_L = h0_.shape[0]
                carry0 = pack_lstm_state(h0_, c0_)
                feat0 = lstm_feat(carry0, pred_L)
            if lm_adapter is not None:
                # LM starts from eos; carry (state, next-token lprobs).
                # Blank-less index shift (transducer_base_decoder.py:85-104):
                # the LM dictionary lacks the blank/bos symbol, so LM index =
                # model index - 1 (blank = bos = 0 in the transducer dict).
                # Cache bound = the true emission ceiling (n_exp labels per
                # frame + the initial eos step), NOT L_max: a hypothesis may
                # emit more than L_max labels before output truncation, and
                # an overflowing positional cache would silently corrupt LM
                # scores (scatter writes past the buffer are dropped).
                lm_max_len = (
                    enc.encoder_out.shape[1] * max(n_exp, 1) + 1
                )
                eos_lm = jnp.full((BK,), self.dict.eos() - 1, jnp.int32)
                if use_big_lm:
                    zdt = big_lm["embed_pre"].dtype
                    h0 = jnp.zeros((BK, big_lm["L"], big_lm["H"]), zdt)
                    out_h, h0, c0 = _big_lm_step(big_lm, eos_lm, h0, h0)
                    lg0 = lm_logits_from_hidden(out_h)
                    s0 = (h0, c0)
                else:
                    s0 = lm_adapter.init_state(
                        lm_variables, None, BK, lm_max_len
                    )
                    lg0, s0, _ = lm_adapter.step(lm_variables, eos_lm, s0)
                if use_lm_kernel:
                    # the kernel path carries gate-padded h/c (padded
                    # channels provably stay 0 — prep_lstm_kernel_inputs),
                    # packed into one 2-D matrix (see pred-net note above)
                    padw = lm_k["Hp"] - lm_k["H"]
                    h_lm0 = jnp.pad(s0[0], ((0, 0), (0, 0), (0, padw)))
                    c_lm0 = jnp.pad(s0[1], ((0, 0), (0, 0), (0, padw)))
                    lm_L = h_lm0.shape[0]
                    s0 = (pack_lstm_state(h_lm0, c_lm0), s0[2], s0[3])
                lm_state0 = (
                    s0,
                    jax.nn.log_softmax(lg0.astype(jnp.float32), -1),
                )
            else:
                lm_state0 = None
            # beam 0 live, others dead
            scores0 = jnp.where(jnp.arange(K)[None, :] == 0, 0.0, NEG_INF) * jnp.ones(
                (B, 1)
            )
            # per-row int bookkeeping, PACKED into one s32 matrix so every
            # expansion round runs ONE gather instead of one per field
            # (the separate [BK] takes were pure launch overhead in the
            # scan — ~24 ms/decode at B=256): column 0 = the rolling
            # sequence hash; under prefix merge (A >= 1) columns 1.. are
            # the emitted-label count and a ring of the last A tokens
            # (newest first). For depth >= 2 the pm state also keeps the
            # last A-1 prediction features (feat_hist[m] = the feature
            # that scored the token m emissions ago) and — under LM
            # fusion — the matching ring of cached LM log-prob rows
            # (reference transducer_beam_search_decoder.py:565-594)
            ints0 = jnp.zeros((BK, 1 + (1 + A if A >= 1 else 0)), jnp.int32)
            pm0 = (
                ints0,
                jnp.zeros((A - 1, BK, feat0.shape[-1]), feat0.dtype)
                if A >= 2
                else None,
                jnp.zeros(
                    (A - 1, BK, lm_state0[1].shape[-1]), jnp.float32
                )
                if A >= 2 and has_lm_bias
                else None,
            )

            enc_proj = model.apply(
                variables, enc.encoder_out, method="joint_enc_proj"
            )

            def frame_step(carry, t):
                (
                    scores,
                    pred_feat,
                    pred_carry,
                    lm_state,
                    pm_state,
                ) = carry
                enc_t = jnp.repeat(enc_proj[:, t], K, axis=0)  # [BK, J]
                active_t = (t < enc.src_lengths)  # [B]

                # backpointer emissions for the host-side backtrace
                bp_fp, bp_msrc, bp_esrc, bp_etok = [], [], [], []

                # pool of next-frame (blank-terminated) hyps.
                # State is NOT gathered at each merge (that moved ~40 MB of
                # LSTM carry per frame — the measured decode bottleneck was
                # exactly these state-sized fusions inside the scan, not
                # FLOPs). Instead each pool slot carries (version, slot)
                # indices into the per-round expansion states; the real
                # state materializes with ONE stacked gather at frame end.
                pool_scores = jnp.full((B, K), NEG_INF)
                pool_hash = pm_state[0][:, 0].reshape(B, K)
                pool_ver = jnp.zeros((B, K), jnp.int32)
                pool_slot = jnp.arange(K)[None, :].repeat(B, 0)

                exp_scores = scores
                exp_hash = pool_hash
                exp_feat, exp_carry, exp_lm = pred_feat, pred_carry, lm_state
                if use_pred_kernel:
                    exp_feat = lstm_feat(exp_carry, pred_L)
                exp_pm = pm_state
                # version v state = expansion state after v label rounds;
                # rows are [BK] b-major, exp slots map to rows identically
                versions = [(exp_feat, exp_carry, exp_lm, exp_pm)]

                # n_exp LABEL expansions per frame (reference semantics),
                # plus a blank-merge after each round (n_exp + 1 merges)
                for j in range(n_exp + 1):
                    # lm_factor_j: the per-row LM renormalization factor
                    # (keep non-blank mass unchanged after fusion — the
                    # reference's log_scaling_factor,
                    # transducer_beam_search_decoder.py:311-322); the
                    # prefix merge reuses it per source row
                    lm_factor_j = None
                    label_lp_lm = None
                    if use_fused:
                        bias_j = lm_label_bias(exp_lm)
                        res = fused_joint_topk(
                            enc_t,
                            exp_feat,
                            exp_scores,
                            K=K,
                            n_cand=n_cand,
                            blank=blank,
                            eos=eos,
                            fold_eos_into_blank=predicts_eos,
                            label_bias=bias_j,
                            interpret=fused_interpret,
                            row_level=True,
                            **joint_w,
                        )
                        if bias_j is not None:
                            blank_lp_f, row_vals_f, row_flat_f, lm_factor_j = (
                                res
                            )
                        else:
                            blank_lp_f, row_vals_f, row_flat_f = res
                        V = Vf
                        blank_scores = exp_scores + blank_lp_f
                        lprobs = None
                    else:
                        logits = model.apply(
                            variables, enc_t, exp_feat,
                            method="joint_step_precomputed",
                        )  # [BK, V]
                        lprobs = jax.nn.log_softmax(
                            logits.astype(jnp.float32), axis=-1
                        ).reshape(B, K, -1)
                        if predicts_eos:
                            # fold eos mass into blank (reference
                            # transducer_beam_search_decoder.py:334-339)
                            lprobs = lprobs.at[:, :, blank].set(
                                jnp.logaddexp(
                                    lprobs[:, :, blank], lprobs[:, :, eos]
                                )
                            ).at[:, :, eos].set(NEG_INF)
                        V = lprobs.shape[-1]
                        blank_scores = exp_scores + lprobs[:, :, blank]
                        if has_lm_bias:
                            # shallow fusion with blank-less index shift +
                            # renormalization (reference :298-322; under
                            # predicts_eos the folded-out eos column is
                            # excluded from the mass on both sides)
                            lab_j = lprobs.at[:, :, blank].set(NEG_INF)
                            _, cached_lp = exp_lm
                            lm_lp = cached_lp.reshape(B, K, -1)
                            width = min(V - 1, lm_lp.shape[-1])
                            shifted = jnp.full(
                                (B, K, V), NEG_INF, jnp.float32
                            )
                            shifted = shifted.at[:, :, 1 : 1 + width].set(
                                lm_lp[..., :width]
                            )
                            fused_lab = lab_j + lm_weight * jnp.maximum(
                                shifted, NEG_INF
                            )
                            lm_factor_j = jax.nn.logsumexp(
                                lab_j, axis=-1
                            ) - jax.nn.logsumexp(fused_lab, axis=-1)
                            label_lp_lm = fused_lab + lm_factor_j[..., None]

                    # ---- proper-prefix merge (frame start only) -----------
                    # reference prefix_search_and_merge semantics: for every
                    # pair (i, j) where seq_i is a proper prefix of seq_j and
                    # len_j - len_i <= A, add score_i + sum of the extension
                    # tokens' log-probs under THIS frame's joint into score_j
                    if j == 0 and A >= 1:
                        ints_pm, fh, lmh = exp_pm
                        sl2 = ints_pm[:, 1].reshape(B, K)
                        th3 = ints_pm[:, 2:].reshape(B, K, A)
                        live2 = exp_scores > NEG_INF / 2

                        if use_fused:
                            # the fused kernel never materializes [BK, V]
                            # log-probs; reconstruct each row's normalizer
                            # from its (score-independent) blank log-prob:
                            # lse = logit_blank - blank_lp, with the joint
                            # hidden recomputed cheaply ([BK, J] einsums)
                            f32 = jnp.float32
                            dproj = (
                                exp_feat.astype(f32)
                                @ joint_w["w_dec"].astype(f32)
                                + joint_w["b_dec"].astype(f32)
                            )
                            mu = dproj.mean(-1, keepdims=True)
                            var = jnp.mean(
                                jnp.square(dproj - mu), -1, keepdims=True
                            )
                            dn = (dproj - mu) * jax.lax.rsqrt(var + 1e-6)
                            dn = dn * joint_w["ln_scale"].astype(f32) + joint_w[
                                "ln_bias"
                            ].astype(f32)
                            hjnt = jnp.maximum(enc_t.astype(f32) + dn, 0.0)
                            w_out = joint_w["w_out"].astype(f32)
                            b_out = joint_w["b_out"].astype(f32)
                            lb = hjnt @ w_out[:, blank] + b_out[blank]
                            if predicts_eos:
                                le = hjnt @ w_out[:, eos] + b_out[eos]
                                lse = jnp.logaddexp(lb, le) - blank_lp_f.reshape(-1)
                            else:
                                lse = lb - blank_lp_f.reshape(-1)
                            h3 = hjnt.reshape(B, K, -1)
                            lse2 = lse.reshape(B, K)

                            def row_tok_lp(src, tok):
                                hsrc = jnp.take_along_axis(
                                    h3, src[:, :, None], axis=1
                                )
                                wt = jnp.take(w_out.T, tok, axis=0)
                                logit = jnp.sum(hsrc * wt, -1) + jnp.take(
                                    b_out, tok
                                )
                                return logit - jnp.take_along_axis(
                                    lse2, src, axis=1
                                )

                        else:

                            def row_tok_lp(src, tok):
                                lp_rows = jnp.take_along_axis(
                                    lprobs, src[:, :, None], axis=1
                                )
                                return jnp.take_along_axis(
                                    lp_rows, tok[:, :, None], axis=2
                                )[..., 0]

                        if A >= 2:
                            # per-row joints on the feature history: the
                            # token m emissions ago scored by feat_hist[m]
                            feat_h = fh.reshape((A - 1) * BK, -1)
                            logits_h = model.apply(
                                variables,
                                jnp.tile(enc_t, (A - 1, 1)),
                                feat_h,
                                method="joint_step_precomputed",
                            )
                            lp_h = jax.nn.log_softmax(
                                logits_h.astype(jnp.float32), -1
                            ).reshape(A - 1, B, K, -1)
                            toks_h = jnp.moveaxis(th3[:, :, : A - 1], 2, 0)
                            lp_tok_h = jnp.take_along_axis(
                                lp_h, toks_h[..., None], axis=3
                            )[..., 0]  # [A-1, B, K]
                            term_h = lp_tok_h
                            if has_lm_bias:
                                # depth >= 2 LM terms: the LM log-prob of
                                # the token m emissions ago under the LM
                                # cache m emissions ago, plus that row's
                                # renormalization factor (reference
                                # :565-594 per-k lm score + scaling)
                                Vh = lp_h.shape[-1]
                                lmh3 = lmh.reshape(A - 1, B, K, -1)
                                wdt = min(Vh - 1, lmh3.shape[-1])
                                lm_tok_h = jnp.take_along_axis(
                                    lmh3,
                                    jnp.maximum(toks_h - 1, 0)[..., None],
                                    axis=3,
                                )[..., 0]
                                lab_h = lp_h.at[..., blank].set(NEG_INF)
                                shifted_h = jnp.full(
                                    lp_h.shape, NEG_INF, jnp.float32
                                )
                                shifted_h = shifted_h.at[
                                    ..., 1 : 1 + wdt
                                ].set(lmh3[..., :wdt])
                                fused_h = lab_h + lm_weight * jnp.maximum(
                                    shifted_h, NEG_INF
                                )
                                fac_h = jax.nn.logsumexp(
                                    lab_h, axis=-1
                                ) - jax.nn.logsumexp(fused_h, axis=-1)
                                term_h = (
                                    lp_tok_h
                                    + lm_weight * lm_tok_h
                                    + fac_h
                                )
                            # cum[m] = sum of history terms 0..m
                            cum_h = jnp.cumsum(term_h, axis=0)

                        if has_lm_bias:
                            _, cached_lp0 = exp_lm
                            lm_lp2 = cached_lp0.reshape(B, K, -1)

                        mass = jnp.full((B, K), NEG_INF)
                        anc = exp_hash
                        for d in range(1, A + 1):
                            anc = (anc - (th3[:, :, d - 1] + 1)) * INV31
                            # eq[b, i, j]: row i is the depth-d prefix of j
                            eq = (
                                (exp_hash[:, :, None] == anc[:, None, :])
                                & (
                                    sl2[:, :, None]
                                    == sl2[:, None, :] - d
                                )
                                & live2[:, :, None]
                                & live2[:, None, :]
                                & (sl2[:, None, :] >= d)
                            )
                            has = eq.any(axis=1)
                            src = jnp.argmax(eq, axis=1).astype(jnp.int32)
                            # first extension token: scored by the SOURCE's
                            # current feature (== j's feature at that prefix)
                            tok0 = th3[:, :, d - 1]
                            contrib = jnp.take_along_axis(
                                exp_scores, src, axis=1
                            ) + row_tok_lp(src, tok0)
                            if d >= 2:
                                contrib = contrib + cum_h[d - 2]
                            if has_lm_bias:
                                # shallow-fusion term, blank-less index
                                # shift, plus the SOURCE row's
                                # renormalization factor (matches the
                                # expansion rounds' fusion; reference
                                # :516-545 first-extension-token scoring)
                                lm_tok = jnp.maximum(tok0 - 1, 0)
                                lm_rows = jnp.take_along_axis(
                                    lm_lp2, src[:, :, None], axis=1
                                )
                                contrib = (
                                    contrib
                                    + lm_weight
                                    * jnp.take_along_axis(
                                        lm_rows, lm_tok[:, :, None], axis=2
                                    )[..., 0]
                                    + jnp.take_along_axis(
                                        lm_factor_j, src, axis=1
                                    )
                                )
                            mass = jnp.logaddexp(
                                mass, jnp.where(has, contrib, NEG_INF)
                            )
                        pre_merge_scores = exp_scores
                        exp_scores = jnp.logaddexp(exp_scores, mass)
                        if use_fused:
                            # the per-row candidate set is score-independent
                            # (the row's score is a constant over its V
                            # candidates): fold the merge's score delta into
                            # the already-computed row values instead of
                            # re-running the joint kernel
                            delta = jnp.where(
                                live2, exp_scores - pre_merge_scores, 0.0
                            )
                            row_vals_f = row_vals_f + delta[..., None]
                            blank_scores = exp_scores + blank_lp_f
                        else:
                            blank_scores = exp_scores + lprobs[:, :, blank]

                    # ---- blank: candidates for the next frame -------------
                    bidx = jnp.arange(B)[:, None]
                    # single-kernel merge: on by default on the fused path
                    # within the tested shape envelope (sublane-aligned B,
                    # 2K lanes in one vreg; wider needs lane-dim slicing the
                    # Mosaic layout pass miscompiles — see ops/decode_kernels
                    # aes_merge docstring). "on+merge" forces it regardless.
                    if fused_interpret or fused_mode == "on+merge" or (
                        use_fused and B % 8 == 0 and 2 * K <= 128
                    ):
                        # single-kernel merge round (dedup + top-K +
                        # bookkeeping) — the ~25 tiny [B, K] XLA ops below
                        # were pure launch overhead inside the scan
                        from espresso_tpu.ops.decode_kernels import aes_merge

                        (
                            pool_scores,
                            pool_hash,
                            pool_ver,
                            pool_slot,
                            fp_i,
                            src_slot,
                        ) = aes_merge(
                            pool_scores,
                            blank_scores,
                            pool_hash,
                            exp_hash,
                            pool_ver,
                            pool_slot,
                            round_j=j,
                            interpret=fused_interpret,
                        )
                        from_pool = fp_i.astype(bool)
                        bp_fp.append(from_pool)
                        bp_msrc.append(src_slot)
                    else:
                        merged_scores = jnp.concatenate(
                            [pool_scores, blank_scores], axis=1
                        )  # [B, 2K]
                        # exact duplicate merge (the reference prefix
                        # merge's equal-sequence case): identical token
                        # sequences share a rolling hash -> logaddexp their
                        # probabilities, keep the first occurrence
                        merged_hash = jnp.concatenate(
                            [pool_hash, exp_hash], axis=1
                        )
                        slot_ids = jnp.arange(2 * K)[None, :]
                        live = merged_scores > NEG_INF / 2
                        eff_hash = jnp.where(
                            live, merged_hash, -(slot_ids + 1)
                        )
                        eq = eff_hash[:, :, None] == eff_hash[:, None, :]
                        comb = jax.nn.logsumexp(
                            jnp.where(eq, merged_scores[:, None, :], NEG_INF),
                            axis=2,
                        )
                        first = jnp.argmax(eq, axis=2) == slot_ids
                        merged_scores = jnp.where(first, comb, NEG_INF)
                        merged_idx = jnp.concatenate(
                            [
                                jnp.arange(K)[None, :].repeat(B, 0),
                                K + jnp.arange(K)[None, :].repeat(B, 0),
                            ],
                            axis=1,
                        )
                        top_pool, sel = jax.lax.top_k(merged_scores, K)
                        take = jnp.take_along_axis(merged_idx, sel, axis=1)
                        from_pool = take < K
                        src_slot = jnp.where(from_pool, take, take - K)
                        bp_fp.append(from_pool)
                        bp_msrc.append(src_slot)
                        new_pool_hash = jnp.where(
                            from_pool,
                            jnp.take_along_axis(pool_hash, src_slot, axis=1),
                            jnp.take_along_axis(exp_hash, src_slot, axis=1),
                        )
                        pool_ver = jnp.where(
                            from_pool,
                            jnp.take_along_axis(pool_ver, src_slot, axis=1),
                            j,
                        )
                        pool_slot = jnp.where(
                            from_pool,
                            jnp.take_along_axis(pool_slot, src_slot, axis=1),
                            src_slot,
                        )
                        pool_scores = top_pool
                        pool_hash = new_pool_hash

                    if j == n_exp:
                        break

                    # ---- label expansion -----------------------------------
                    if use_fused:
                        top_cand, cand_idx = rows_topk(
                            row_vals_f, row_flat_f, n_cand
                        )
                    else:
                        # LM-fused label log-probs (shift + renormalize)
                        # were built at the round top
                        label_lp = (
                            label_lp_lm
                            if label_lp_lm is not None
                            else lprobs.at[:, :, blank].set(NEG_INF)
                        )
                        cand = (exp_scores[..., None] + label_lp).reshape(
                            B, K * V
                        )
                        top_cand, cand_idx = _exact_topk_rows(cand, n_cand)
                    # prune-by-value: drop candidates > gamma below the best.
                    # top_cand is sorted descending, so the gamma threshold
                    # keeps a PREFIX — the best K survivors are simply the
                    # first K columns (no second top_k; a dependent sort here
                    # also defeats XLA's fast TopK lowering of the big one,
                    # costing ~3ms/frame at B=256)
                    if gamma is not None:
                        ok = top_cand >= (top_cand[:, :1] - gamma)
                        top_cand = jnp.where(ok, top_cand, NEG_INF)
                    keep_scores = top_cand[:, :K]
                    keep_idx = cand_idx[:, :K]
                    src_beam = keep_idx // V
                    new_tok = (keep_idx % V).astype(jnp.int32)
                    bp_esrc.append(src_beam.astype(jnp.int32))
                    bp_etok.append(new_tok)

                    flat_beam = (bidx * K + src_beam).reshape(-1)
                    exp_scores = keep_scores
                    live = (keep_scores > NEG_INF / 2).reshape(-1)
                    # ONE gather updates every packed int field: the
                    # rolling hash (col 0) and, under prefix merge, the
                    # emitted-label count + token ring
                    ints_e, fh_e, lmh_e = exp_pm
                    ints_g = jnp.take(ints_e, flat_beam, axis=0)
                    new_hash = ints_g[:, 0] * jnp.int32(31) + (
                        new_tok.reshape(-1) + 1
                    )
                    cols = [new_hash[:, None]]
                    if A >= 1:
                        sl_e = jnp.where(live, ints_g[:, 1] + 1, ints_g[:, 1])
                        th_old = ints_g[:, 2:]
                        th_e = jnp.where(
                            live[:, None],
                            jnp.concatenate(
                                [new_tok.reshape(-1, 1), th_old[:, :-1]],
                                axis=1,
                            ),
                            th_old,
                        )
                        cols += [sl_e[:, None], th_e]
                    ints_e = jnp.concatenate(cols, axis=1)
                    exp_hash = new_hash.reshape(B, K)

                    def reorder(tree):
                        def g(x):
                            axis = 1 if x.ndim == 3 and x.shape[1] == BK else 0
                            return jnp.take(x, flat_beam, axis=axis)

                        return jax.tree_util.tree_map(g, tree)

                    if use_pred_kernel:
                        # the fused step kernel gathers the carry itself;
                        # only the pm feature ring (depth >= 2) still needs
                        # the reordered pre-advance feature
                        exp_feat_r = (
                            jnp.take(exp_feat, flat_beam, axis=0)
                            if A >= 2
                            else None
                        )
                    else:
                        exp_feat = reorder(exp_feat)
                        exp_carry = reorder(exp_carry)
                        exp_feat_r = exp_feat
                    if exp_lm is not None:
                        if use_lm_kernel:
                            # the LM step kernel gathers the packed state
                            # itself; only the cached log-probs (the pm
                            # ring + next round's bias read them
                            # pre-advance) and the small leaves reorder
                            (S_lmS, fd_lmS, pv_lmS), cached_lmS = exp_lm
                            exp_lm = (
                                (
                                    S_lmS,
                                    jnp.take(fd_lmS, flat_beam, axis=0),
                                    jnp.take(pv_lmS, flat_beam, axis=0),
                                ),
                                jnp.take(cached_lmS, flat_beam, axis=0),
                            )
                        else:
                            exp_lm = reorder(exp_lm)
                    # prefix-merge rings (depth >= 2): push the pre-advance
                    # prediction feature + the pre-advance cached LM
                    # log-probs under fusion
                    if fh_e is not None:
                        fh_g = jnp.take(fh_e, flat_beam, axis=1)
                        fh_e = jnp.where(
                            live[None, :, None],
                            jnp.concatenate(
                                [exp_feat_r[None], fh_g[:-1]], axis=0
                            ),
                            fh_g,
                        )
                    if lmh_e is not None:
                        # exp_lm was reordered by flat_beam above and
                        # not yet advanced: its cached log-probs are
                        # exactly the ones that scored new_tok
                        lmh_g = jnp.take(lmh_e, flat_beam, axis=1)
                        lmh_e = jnp.where(
                            live[None, :, None],
                            jnp.concatenate(
                                [exp_lm[1][None], lmh_g[:-1]], axis=0
                            ),
                            lmh_g,
                        )
                    exp_pm = (ints_e, fh_e, lmh_e)
                    # advance prediction net with the new labels

                    def live_mask(new, old):
                        axis = 1 if new.ndim == 3 and new.shape[1] == BK else 0
                        shape = [1] * new.ndim
                        shape[axis] = BK
                        m = live.reshape(shape)
                        return jnp.where(m, new, old)

                    if use_pred_kernel:
                        # one Pallas kernel: beam reorder + all LSTM layers
                        # + live mask (gathered state and [BK, 4H]
                        # preactivations never touch HBM)
                        x_emb = jnp.take(
                            pred_embed, new_tok.reshape(-1), axis=0
                        )
                        exp_carry = lstm_step_reorder(
                            x_emb,
                            exp_carry,
                            flat_beam,
                            live,
                            B=B,
                            K=K,
                            interpret=fused_interpret,
                            **pred_w,
                        )
                        # pred-net invariant: exp_feat == top-layer hidden
                        exp_feat = lstm_feat(exp_carry, pred_L)
                    else:
                        new_feat, new_carry = model.apply(
                            variables,
                            new_tok.reshape(-1),
                            exp_carry,
                            method="pred_step",
                        )
                        exp_feat = jnp.where(
                            live[:, None], new_feat, exp_feat
                        )
                        exp_carry = jax.tree_util.tree_map(
                            live_mask, new_carry, exp_carry
                        )
                    if exp_lm is not None and lm_adapter is not None:
                        lm_tok = jnp.maximum(new_tok.reshape(-1) - 1, 0)
                        if use_lm_kernel:
                            (S_lm, fd_r, pv_r), cached_r = exp_lm
                            x_lm = jnp.take(lm_k["embed"], lm_tok, axis=0)
                            S_lm_o = lstm_step_reorder(
                                x_lm,
                                S_lm,
                                flat_beam,
                                live,
                                lm_k["w_ih"],
                                lm_k["b_ih"],
                                lm_k["w_hh"],
                                B=B,
                                K=K,
                                interpret=fused_interpret,
                            )
                            lg = lm_logits_from_hidden(
                                lstm_feat(S_lm_o, lm_L)[:, : lm_k["H"]]
                            )
                            lp_new = jax.nn.log_softmax(
                                lg.astype(jnp.float32), -1
                            )
                            exp_lm = (
                                (
                                    S_lm_o,
                                    fd_r,
                                    jnp.where(live, lm_tok, pv_r),
                                ),
                                jnp.where(live[:, None], lp_new, cached_r),
                            )
                        else:
                            st, _ = exp_lm
                            if use_big_lm:
                                out_h, h_n, c_n = _big_lm_step(
                                    big_lm, lm_tok, st[0], st[1]
                                )
                                lg = lm_logits_from_hidden(out_h)
                                new_st = (h_n, c_n)
                            else:
                                lg, new_st, _ = lm_adapter.step(
                                    lm_variables, lm_tok, st
                                )
                            new_exp_lm = (
                                new_st,
                                jax.nn.log_softmax(
                                    lg.astype(jnp.float32), -1
                                ),
                            )
                            exp_lm = jax.tree_util.tree_map(
                                live_mask, new_exp_lm, exp_lm
                            )
                    versions.append((exp_feat, exp_carry, exp_lm, exp_pm))

                # materialize the winning pool states: per-version gathers
                # selected by the slot's version index (avoids concatenating
                # the versions into a [R*BK, ...] buffer — XLA emitted that
                # concat as two 15 MB copies per frame)
                flat_slot = (bidx * K + pool_slot).reshape(-1)
                flat_ver = pool_ver.reshape(-1)
                # inactive frames: keep previous beam unchanged (fused into
                # the version gather below — one masked pass per leaf instead
                # of a gather pass plus a keep pass)
                keep_old = ~active_t
                keep_bk = jnp.repeat(keep_old, K)

                def gather_versions(old, leaves):
                    def g(old_leaf, *leaf_versions):
                        x0 = leaf_versions[0]
                        axis = 1 if x0.ndim == 3 and x0.shape[1] == BK else 0
                        shape = [1] * x0.ndim
                        shape[axis] = BK
                        out = jnp.take(leaf_versions[0], flat_slot, axis=axis)
                        for v in range(1, len(leaf_versions)):
                            m = (flat_ver == v).reshape(shape)
                            out = jnp.where(
                                m,
                                jnp.take(leaf_versions[v], flat_slot, axis=axis),
                                out,
                            )
                        return jnp.where(keep_bk.reshape(shape), old_leaf, out)

                    return jax.tree_util.tree_map(g, old, *leaves)

                if not use_pred_kernel:
                    # kernel mode: the feature IS a slice of the packed
                    # state — no separate version gather
                    pred_feat = gather_versions(
                        pred_feat, [v[0] for v in versions]
                    )
                pred_carry = gather_versions(
                    pred_carry, [v[1] for v in versions]
                )
                if lm_state is not None:
                    lm_state = gather_versions(
                        lm_state, [v[2] for v in versions]
                    )
                pm_state = gather_versions(
                    pm_state, [v[3] for v in versions]
                )

                scores = jnp.where(keep_old[:, None], scores, pool_scores)
                ys = (
                    jnp.stack(bp_fp),  # [n_exp+1, B, K] bool
                    jnp.stack(bp_msrc).astype(jnp.int32),
                    jnp.stack(bp_esrc) if bp_esrc else jnp.zeros(
                        (0, B, K), jnp.int32
                    ),
                    jnp.stack(bp_etok) if bp_etok else jnp.zeros(
                        (0, B, K), jnp.int32
                    ),
                )
                return (
                    scores,
                    pred_feat,
                    pred_carry,
                    lm_state,
                    pm_state,
                ), ys

            if use_pred_kernel:
                # the feature is a column slice of the packed state — no
                # separate carry slot (zero-width placeholder keeps the
                # carry structure shared with the jnp path)
                feat0 = jnp.zeros((BK, 0), pdtype)
            init = (scores0, feat0, carry0, lm_state0, pm0)
            T_enc = enc.encoder_out.shape[1]
            (scores, _, _, _, _), ys = jax.lax.scan(
                frame_step, init, jnp.arange(T_enc)
            )

            # ---- device-side backpointer walk ---------------------------
            # (the ys stay on device; only compact int16 tokens transfer —
            # the host link is the slow path at ~20 MB/s through the TPU
            # tunnel, so bytes moved dominate decode latency at this scale)
            fp_a, msrc_a, esrc_a, etok_a = ys
            order = jnp.argsort(-scores, axis=1)
            scores_sorted = jnp.take_along_axis(scores, order, axis=1)
            bidx = jnp.arange(B)[:, None]
            kcols = jnp.arange(K)[None, :]
            Lcap = L_max

            def bstep(slot, inp):
                fp_t, msrc_t, esrc_t, etok_t, t = inp
                act = (t < enc.src_lengths)[:, None]
                cont = act & jnp.ones((B, K), bool)
                exit_level = jnp.full((B, K), -1, jnp.int32)
                exit_slot = slot
                cur = slot
                for j in range(n_exp, -1, -1):
                    f = jnp.take_along_axis(fp_t[j], cur, axis=1)
                    src = jnp.take_along_axis(msrc_t[j], cur, axis=1)
                    newly = cont & ~f
                    exit_level = jnp.where(newly, j, exit_level)
                    exit_slot = jnp.where(newly, src, exit_slot)
                    cur = jnp.where(cont & f, src, cur)
                    cont = cont & f
                s = exit_slot
                toks_r, valid_r = [], []
                for r in range(n_exp, 0, -1):
                    m = exit_level >= r
                    tok = jnp.take_along_axis(etok_t[r - 1], s, axis=1)
                    src = jnp.take_along_axis(esrc_t[r - 1], s, axis=1)
                    toks_r.append(jnp.where(m, tok, 0).astype(jnp.int16))
                    valid_r.append(m)
                    s = jnp.where(m, src, s)
                if not toks_r:  # n_exp == 0 (degenerate)
                    toks_r = [jnp.zeros((B, K), jnp.int16)]
                    valid_r = [jnp.zeros((B, K), bool)]
                return s, (jnp.stack(toks_r), jnp.stack(valid_r))

            if use_fused and n_exp >= 1:
                # single-kernel backtrace (tiny per-frame tiles; the scan
                # version paid ~30 ops of launch overhead per frame)
                from espresso_tpu.ops.decode_kernels import aes_backtrace

                act_arr = (
                    jnp.arange(T_enc)[:, None] < enc.src_lengths[None, :]
                ).astype(jnp.int32)[:, :, None]
                toks_i, valid_i = aes_backtrace(
                    act_arr,
                    fp_a.astype(jnp.int32),
                    msrc_a,
                    esrc_a,
                    etok_a,
                    order.astype(jnp.int32),
                    n_exp,
                    interpret=fused_interpret,
                )
                toks_e = toks_i.astype(jnp.int16)
                valid_e = valid_i.astype(bool)
            else:
                _, (toks_e, valid_e) = jax.lax.scan(
                    bstep,
                    order.astype(jnp.int32),
                    (fp_a, msrc_a, esrc_a, etok_a, jnp.arange(T_enc)),
                    reverse=True,
                )
            # toks_e/valid_e: [T, n_exp, B, K] in frame order; the emission
            # (reversed-sequence) order is frames DESCENDING, rounds as
            # stored — flip the frame axis and flatten, then one cumsum
            # gives each token its position from the sequence end and one
            # scatter materializes forward-order tokens (no per-step buffer
            # churn inside the scan)
            E = max(n_exp, 1)
            em_tok = jnp.flip(toks_e, axis=0).reshape(T_enc * E, B, K)
            em_val = jnp.flip(valid_e, axis=0).reshape(T_enc * E, B, K)
            cum = jnp.cumsum(em_val.astype(jnp.int32), axis=0)
            lens = jnp.minimum(cum[-1], Lcap)
            pos_from_end = cum - 1  # inclusive cumsum -> 0-based from end
            fwd = cum[-1][None] - 1 - pos_from_end
            # invalid or overflow positions are routed past the buffer edge
            fwd = jnp.where(em_val & (fwd < Lcap), fwd, Lcap)
            out = jnp.zeros((B, K, Lcap + 1), jnp.int16)
            out = out.at[
                jnp.broadcast_to(bidx[None], em_tok.shape),
                jnp.broadcast_to(kcols[None], em_tok.shape),
                fwd,
            ].set(em_tok)
            toks = out[:, :, :Lcap]
            # pack (scores, lens, tokens) into ONE int32 array: each
            # device->host transfer over the tunnel costs ~35 ms of latency
            # on top of ~20 MB/s, so one packed transfer beats three
            pad = (-Lcap) % 2
            toks16 = jnp.pad(toks, ((0, 0), (0, 0), (0, pad)))
            toks32 = jax.lax.bitcast_convert_type(
                toks16.reshape(B, K, -1, 2), jnp.int32
            )
            packed = jnp.concatenate(
                [
                    jax.lax.bitcast_convert_type(
                        scores_sorted.astype(jnp.float32), jnp.int32
                    )[..., None],
                    lens.astype(jnp.int32)[..., None],
                    toks32,
                ],
                axis=2,
            )
            return packed

        return jax.jit(run)

    def decode_async(self, variables, batch):
        """Launch the jitted search and return an opaque handle; the
        device->host transfer is deferred to ``collect``. Pipelining
        batches (launch batch i+1 before collecting batch i) overlaps the
        next batch's device compute with this result's host fetch — the
        packed-result transfer is a significant fraction of decode wall
        time on hosts with slow links, and the device queue keeps
        executing while the host blocks on a previous fetch."""
        src_frames = jnp.asarray(batch["src_frames"])
        src_lengths = jnp.asarray(batch["src_lengths"])
        T = src_frames.shape[1]
        L_max = max(int(T * self.max_out_factor), 8)
        key = (src_frames.shape, L_max)
        if key not in self._jitted:
            self._jitted[key] = self._search_fn(T, L_max)
        packed = self._jitted[key](
            variables, self.lm_variables, src_frames, src_lengths
        )
        return packed, L_max

    def collect(self, handle) -> List[List[Dict[str, Any]]]:
        """Fetch + unpack a ``decode_async`` handle into n-best lists."""
        packed_dev, L_max = handle
        packed = np.asarray(packed_dev)
        scores = np.ascontiguousarray(packed[:, :, 0]).view(np.float32)
        lens = packed[:, :, 1].astype(np.int64)
        tokens = (
            np.ascontiguousarray(packed[:, :, 2:])
            .view(np.int16)
            .astype(np.int32)[:, :, :L_max]
        )
        results = []
        for b in range(scores.shape[0]):
            hyps = []
            for k in range(scores.shape[1]):
                if scores[b, k] <= NEG_INF / 2:
                    continue
                hyps.append(
                    {
                        "tokens": tokens[b, k, : lens[b, k]].astype(np.int32),
                        "score": float(scores[b, k]),
                    }
                )
            if not hyps:
                hyps = [{"tokens": np.zeros(0, np.int32), "score": NEG_INF}]
            results.append(hyps)
        return results

    def decode(self, variables, batch) -> List[List[Dict[str, Any]]]:
        return self.collect(self.decode_async(variables, batch))

    generate = decode
