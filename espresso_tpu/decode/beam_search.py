"""Batched on-device beam search with LM shallow fusion.

Rebuild of fairseq/sequence_generator.py:212-767 semantics (2×beam candidate
expansion, prefix/min-len constraints, espresso's ``--eos-factor`` gate
speech_recognize.py + sequence_generator :404-410, length-normalized
finalization :657-767) and fairseq/search.py BeamSearch:103 — re-designed as
a single ``lax.scan`` over steps:

  * all B utterances × K beams advance in one [B*K] decoder step;
  * top-2K candidate selection per utterance is one topk over [B, K*V];
  * beam reorder is a gather over the state pytree (adapters, decode/api.py);
  * finished hypotheses insert into fixed [B, K] buffers by concat+topk
    (no host control flow anywhere).

LM fusion: ``lprobs += lm_weight * lm_lprobs`` (shallow fusion,
sequence_generator.py:385-393); the LM state rides the same reorder.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.decode.api import make_adapter, repeat_encoder_out

NEG_INF = -1.0e9


class BeamSearchDecoder:
    def __init__(
        self,
        model,
        dictionary,
        beam_size: int = 5,
        max_len_a: float = 0.0,
        max_len_b: int = 200,
        min_len: int = 1,
        len_penalty: float = 1.0,
        eos_factor: Optional[float] = None,
        temperature: float = 1.0,
        lm=None,
        lm_weight: float = 0.0,
        lm_variables=None,
        sampling: bool = False,
        sampling_topk: int = -1,
        sampling_topp: float = -1.0,
        seed: int = 0,
        no_repeat_ngram_size: int = 0,
        diverse_beam_groups: int = 1,
        diverse_beam_strength: float = 0.5,
    ):
        # model ensembles average probabilities per step (reference
        # EnsembleModel, sequence_generator.py): pass a list of models and a
        # matching list of variables to decode()
        self.models = model if isinstance(model, (list, tuple)) else [model]
        self.model = self.models[0]
        self.adapters = [make_adapter(m) for m in self.models]
        self.adapter = self.adapters[0]
        self.sampling = sampling
        self.sampling_topk = sampling_topk
        self.sampling_topp = sampling_topp
        self.seed = seed
        self.no_repeat_ngram = no_repeat_ngram_size
        self.div_groups = diverse_beam_groups
        self.div_strength = diverse_beam_strength
        if self.div_groups > 1 and beam_size % self.div_groups != 0:
            raise ValueError("beam_size must be divisible by diverse_beam_groups")
        self.dict = dictionary
        self.beam = beam_size
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.min_len = min_len
        self.len_penalty = len_penalty
        self.eos_factor = eos_factor
        self.temperature = temperature
        self.eos = dictionary.eos()
        self.pad = dictionary.pad()
        if lm is None:
            self.lm_adapter = None
        elif hasattr(lm, "init_state") and hasattr(lm, "reorder"):
            self.lm_adapter = lm  # lookahead/multi-level LMs are adapters
        else:
            self.lm_adapter = make_adapter(lm)
        self.lm_weight = lm_weight
        self.lm_variables = lm_variables
        self._jitted: Dict[Tuple, Any] = {}

    # ------------------------------------------------------------------
    def _search_fn(self, max_len: int, pref_len: int = 0, nc: int = 0, cl: int = 0):
        K = self.beam
        eos, pad = self.eos, self.pad
        min_len = self.min_len
        lenpen = self.len_penalty
        eos_factor = self.eos_factor
        temp = self.temperature
        adapter = self.adapter
        lm_adapter = self.lm_adapter
        lm_weight = self.lm_weight

        adapters = self.adapters
        sampling = self.sampling
        topk_k = self.sampling_topk
        topp = self.sampling_topp
        seed = self.seed
        ngram_n = self.no_repeat_ngram
        G = self.div_groups
        div_strength = self.div_strength

        if nc > 0 and (sampling or G > 1):
            raise ValueError(
                "lexical constraints are not supported with sampling or "
                "diverse beam groups (reference has the same restriction)"
            )

        def run(
            variables_list,
            lm_variables,
            src_frames,
            src_lengths,
            pref_toks,
            cons=None,
        ):
            B = src_frames.shape[0]
            BK = B * K
            encs, states = [], []
            for mdl, adp, mvars in zip(self.models, adapters, variables_list):
                enc_i = mdl.apply(mvars, src_frames, src_lengths, method="encode")
                enc_rep_i = repeat_encoder_out(enc_i, K)
                encs.append(enc_rep_i)
                states.append(adp.init_state(mvars, enc_rep_i, BK, max_len))
            enc_rep = encs[0]
            state = tuple(states)
            lm_state = (
                lm_adapter.init_state(lm_variables, None, BK, max_len)
                if lm_adapter is not None
                else None
            )

            tokens0 = jnp.full((B, K, max_len + 1), pad, jnp.int32)
            tokens0 = tokens0.at[:, :, 0].set(eos)  # eos-led prefix
            pref_lens = (
                (pref_toks != pad).sum(axis=1) if pref_len > 0 else None
            )
            # only the first beam of each diversity group live initially
            # (all beams identical otherwise); G=1 -> beam 0 only
            scores0 = jnp.where(
                jnp.arange(K)[None, :] % (K // G) == 0, 0.0, NEG_INF
            ) * jnp.ones((B, 1))
            fin_tokens0 = jnp.full((B, K, max_len + 1), pad, jnp.int32)
            fin_scores0 = jnp.full((B, K), NEG_INF)
            fin_raw0 = jnp.full((B, K), NEG_INF)
            fin_lens0 = jnp.zeros((B, K), jnp.int32)
            # lexically-constrained decoding state: per-(beam, constraint)
            # progress pointer (tokens of the phrase matched so far)
            ptr0 = jnp.zeros((B, K, max(nc, 1)), jnp.int32)
            if nc > 0:
                cons_len = (cons != pad).sum(axis=-1)  # [B, NC]
                total_cons = cons_len.sum(axis=-1)  # [B]

            def step_fn(carry, step):
                (
                    tokens,
                    scores,
                    state,
                    lm_state,
                    fin_tokens,
                    fin_scores,
                    fin_raw,
                    fin_lens,
                    ptr,
                ) = carry
                cur_tok = jax.lax.dynamic_slice_in_dim(
                    tokens.reshape(BK, -1), step, 1, axis=1
                )[:, 0]
                new_states = []
                per_model_lp = []
                for adp, mvars, enc_i, st_i in zip(
                    adapters, variables_list, encs, state
                ):
                    logits, st_i, _ = adp.step(mvars, cur_tok, st_i, enc_i, step)
                    per_model_lp.append(
                        jax.nn.log_softmax(
                            logits.astype(jnp.float32) / temp, axis=-1
                        )
                    )
                    new_states.append(st_i)
                state = tuple(new_states)
                if len(per_model_lp) == 1:
                    lprobs = per_model_lp[0]
                else:
                    # probability-space average (reference EnsembleModel)
                    lprobs = jax.nn.logsumexp(
                        jnp.stack(per_model_lp), axis=0
                    ) - jnp.log(float(len(per_model_lp)))
                if lm_adapter is not None and lm_weight != 0.0:
                    lm_out, lm_state, _ = lm_adapter.step(
                        lm_variables, cur_tok, lm_state
                    )
                    if getattr(lm_adapter, "returns_log_probs", False):
                        lm_lp = lm_out.astype(jnp.float32)
                    else:
                        lm_lp = jax.nn.log_softmax(
                            lm_out.astype(jnp.float32), axis=-1
                        )
                    V_model = lprobs.shape[-1]
                    if lm_lp.shape[-1] < V_model:
                        lm_lp = jnp.pad(
                            lm_lp,
                            ((0, 0), (0, V_model - lm_lp.shape[-1])),
                            constant_values=NEG_INF,
                        )
                    lprobs = lprobs + lm_weight * lm_lp[:, :V_model]

                lprobs = lprobs.at[:, pad].set(NEG_INF)
                # min-len: ban eos before min_len tokens emitted
                lprobs = jnp.where(
                    (step < min_len),
                    lprobs.at[:, eos].set(NEG_INF),
                    lprobs,
                )
                if eos_factor is not None:
                    # eos allowed only if lprob_eos >= eos_factor * best_other
                    # (both negative; reference speech_recognize eos_factor,
                    # sequence_generator :404-410)
                    eos_lp = lprobs[:, eos]
                    others = lprobs.at[:, eos].set(NEG_INF)
                    best_other = others.max(axis=-1)
                    allow = eos_lp >= eos_factor * best_other
                    lprobs = lprobs.at[:, eos].set(
                        jnp.where(allow, eos_lp, NEG_INF)
                    )

                V = lprobs.shape[-1]
                if ngram_n > 0 and max_len + 1 >= ngram_n:
                    # vectorized no-repeat-ngram block (reference
                    # fairseq/sequence_generator.py NGramRepeatBlock /
                    # ngram_repeat_block CUDA op): ban any token v that would
                    # complete an n-gram already present in the prefix. For
                    # every start p, window tokens[p:p+n-1] is compared to the
                    # current (n-1)-token suffix; matches ban tokens[p+n-1].
                    tk = tokens.reshape(BK, -1)
                    Lp1 = tk.shape[1]
                    P = Lp1 - ngram_n + 1
                    suf_start = jnp.maximum(step - (ngram_n - 2), 0)
                    last = jax.lax.dynamic_slice_in_dim(
                        tk, suf_start, ngram_n - 1, axis=1
                    )  # [BK, n-1]
                    match = jnp.ones((BK, P), bool)
                    for i in range(ngram_n - 1):
                        match = match & (tk[:, i : i + P] == last[:, i : i + 1])
                    ppos = jnp.arange(P)
                    match = match & (
                        (ppos[None, :] + (ngram_n - 1) <= step)
                        & (step >= ngram_n - 1)
                    )
                    banned = tk[:, ngram_n - 1 : ngram_n - 1 + P]  # [BK, P]
                    ban_mask = (
                        jnp.zeros((BK, V), bool)
                        .at[jnp.arange(BK)[:, None], banned]
                        .max(match)
                    )
                    lprobs = jnp.where(ban_mask, NEG_INF, lprobs)
                if pref_len > 0:
                    # force decoding through the given prefix (reference
                    # sequence_generator._prefix_tokens: keep the prefix
                    # token's own lprob, ban everything else)
                    in_pref = step < pref_lens  # [B]
                    forced = jax.lax.dynamic_slice_in_dim(
                        pref_toks,
                        jnp.minimum(step, pref_len - 1),
                        1,
                        axis=1,
                    )[:, 0]  # [B]
                    forced_bk = jnp.broadcast_to(
                        forced[:, None], (B, K)
                    ).reshape(BK)
                    in_pref_bk = jnp.broadcast_to(
                        in_pref[:, None], (B, K)
                    ).reshape(BK)
                    not_forced = (
                        jnp.arange(V)[None, :] != forced_bk[:, None]
                    )
                    lprobs = jnp.where(
                        in_pref_bk[:, None] & not_forced, NEG_INF, lprobs
                    )
                if sampling:
                    # independent per-beam ancestral sampling (reference
                    # search.py Sampling:621 with top-k/top-p truncation)
                    lp = lprobs
                    if topk_k > 0:
                        kth = jnp.sort(lp, axis=-1)[:, -topk_k][:, None]
                        lp = jnp.where(lp >= kth, lp, NEG_INF)
                    if topp > 0:
                        srt = jnp.sort(lp, axis=-1)[:, ::-1]
                        cdf = jnp.cumsum(jax.nn.softmax(srt, -1), axis=-1)
                        cutoff_idx = jnp.argmax(cdf >= topp, axis=-1)
                        kth = jnp.take_along_axis(
                            srt, cutoff_idx[:, None], axis=1
                        )
                        lp = jnp.where(lp >= kth, lp, NEG_INF)
                    skey = jax.random.fold_in(jax.random.PRNGKey(seed), step)
                    sampled = jax.random.categorical(skey, lp, axis=-1)
                    samp_lp = jnp.take_along_axis(
                        lprobs, sampled[:, None], axis=1
                    )[:, 0]
                    tok_idx = sampled.reshape(B, K).astype(jnp.int32)
                    top_scores = scores + samp_lp.reshape(B, K)
                    beam_idx = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
                    # pad to 2K with dead slots to reuse the finalize path
                    pad_scores = jnp.full((B, K), NEG_INF)
                    top_scores = jnp.concatenate([top_scores, pad_scores], 1)
                    tok_idx = jnp.concatenate([tok_idx, tok_idx], axis=1)
                    beam_idx = jnp.concatenate([beam_idx, beam_idx], axis=1)
                elif G > 1:
                    # diverse beam search (reference fairseq/search.py
                    # DiverseBeamSearch, Vijayakumar et al. 2016): groups of
                    # K/G beams select sequentially; later groups see a
                    # penalty proportional to how often each token was
                    # already picked this step. Penalized scores are kept
                    # (reference keeps them too).
                    Kg = K // G
                    lp3 = lprobs.reshape(B, K, V)
                    div_buf = jnp.zeros((B, V), lprobs.dtype)
                    s_parts, b_parts, t_parts = [], [], []
                    for g in range(G):
                        lp_g = (
                            lp3[:, g * Kg : (g + 1) * Kg]
                            + scores[:, g * Kg : (g + 1) * Kg, None]
                            - div_strength * div_buf[:, None, :]
                        ).reshape(B, Kg * V)
                        s_g, i_g = jax.lax.top_k(lp_g, 2 * Kg)
                        t_g = (i_g % V).astype(jnp.int32)
                        div_buf = div_buf.at[
                            jnp.arange(B)[:, None], t_g
                        ].add(1.0)
                        s_parts.append(s_g)
                        b_parts.append(i_g // V + g * Kg)
                        t_parts.append(t_g)
                    top_scores = jnp.concatenate(s_parts, axis=1)
                    beam_idx = jnp.concatenate(b_parts, axis=1)
                    tok_idx = jnp.concatenate(t_parts, axis=1)
                elif nc > 0:
                    # Lexically-constrained beam search (reference
                    # fairseq/search.py LexicallyConstrainedBeamSearch:210 +
                    # token_generation_constraints.py; Post & Vilar 2018
                    # dynamic beam allocation, Hu et al. 2019 unordered
                    # constraints). Candidates = standard top-2K PLUS, for
                    # every (beam, constraint), the token that advances that
                    # constraint; selection reserves a slot for the best
                    # candidate of every progress bank.
                    cand = scores.reshape(BK, 1) + lprobs
                    top_scores_a, top_idx_a = jax.lax.top_k(
                        cand.reshape(B, K * V), 2 * K
                    )
                    beam_a = top_idx_a // V
                    tok_a = (top_idx_a % V).astype(jnp.int32)
                    # advance candidates: next required token per constraint
                    safe_ptr = jnp.minimum(ptr, cl - 1)  # [B, K, NC]
                    next_tok = jnp.take_along_axis(
                        jnp.broadcast_to(cons[:, None], (B, K, nc, cl)),
                        safe_ptr[..., None],
                        axis=3,
                    )[..., 0]  # [B, K, NC]
                    unfinished = ptr < cons_len[:, None, :]
                    lp3 = lprobs.reshape(B, K, V)
                    adv_scores = scores[:, :, None] + jnp.take_along_axis(
                        lp3, next_tok, axis=2
                    )  # [B, K, NC]
                    adv_scores = jnp.where(unfinished, adv_scores, NEG_INF)
                    beam_b = jnp.broadcast_to(
                        jnp.arange(K)[None, :, None], (B, K, nc)
                    ).reshape(B, K * nc)
                    tok_b = next_tok.reshape(B, K * nc)
                    scores_b = adv_scores.reshape(B, K * nc)
                    # every beam also gets an explicit eos candidate: a
                    # constraint-complete hypothesis must be able to finish
                    # even when unconstrained beams crowd the top-2K
                    scores_e = scores + lp3[:, :, eos]  # [B, K]
                    beam_e = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
                    tok_e = jnp.full((B, K), eos, jnp.int32)
                    beam_b = jnp.concatenate([beam_b, beam_e], axis=1)
                    tok_b = jnp.concatenate([tok_b, tok_e], axis=1)
                    scores_b = jnp.concatenate([scores_b, scores_e], axis=1)
                    # dedup against the top-2K list (same beam + token)
                    dupe = (
                        (beam_b[:, :, None] == beam_a[:, None, :])
                        & (tok_b[:, :, None] == tok_a[:, None, :])
                    ).any(axis=2)
                    scores_b = jnp.where(dupe, NEG_INF, scores_b)
                    top_scores = jnp.concatenate([top_scores_a, scores_b], 1)
                    beam_idx = jnp.concatenate([beam_a, beam_b], axis=1)
                    tok_idx = jnp.concatenate([tok_a, tok_b], axis=1)
                else:
                    cand = scores.reshape(BK, 1) + lprobs  # [BK, V]
                    cand = cand.reshape(B, K * V)
                    top_scores, top_idx = jax.lax.top_k(cand, 2 * K)
                    beam_idx = top_idx // V  # [B, 2K]
                    tok_idx = (top_idx % V).astype(jnp.int32)

                if nc > 0:
                    # constraint-pointer transition for EVERY candidate:
                    # advance the first constraint whose next token matches;
                    # any other in-progress (0 < ptr < len) phrase resets
                    NCand = tok_idx.shape[1]
                    cptr = jnp.take_along_axis(
                        ptr, beam_idx[:, :, None], axis=1
                    )  # [B, NCand, NC]
                    safe_cptr = jnp.minimum(cptr, cl - 1)
                    req = jnp.take_along_axis(
                        jnp.broadcast_to(cons[:, None], (B, NCand, nc, cl)),
                        safe_cptr[..., None],
                        axis=3,
                    )[..., 0]  # [B, NCand, NC]
                    open_c = cptr < jnp.broadcast_to(
                        cons_len[:, None, :], (B, NCand, nc)
                    )
                    hits = (tok_idx[:, :, None] == req) & open_c
                    first = jnp.argmax(hits, axis=2)
                    any_hit = hits.any(axis=2)
                    advance = (
                        jax.nn.one_hot(first, nc, dtype=bool)
                        & any_hit[:, :, None]
                        & hits
                    )
                    cand_ptr = jnp.where(
                        advance,
                        cptr + 1,
                        jnp.where(open_c & (cptr > 0), 0, cptr),
                    )
                    cand_met = cand_ptr.sum(axis=2)  # [B, NCand]
                    all_met = cand_met >= total_cons[:, None]

                is_eos = tok_idx == eos
                # a hypothesis may only finish once every constraint is met
                # (reference ConstraintSequence finished gate); eos tokens of
                # unmet hypotheses are dropped from BOTH buffers
                can_finish = is_eos & all_met if nc > 0 else is_eos
                # --- finalize eos candidates ------------------------------
                new_len = step + 1  # tokens emitted including eos
                norm = top_scores / jnp.maximum(
                    new_len.astype(jnp.float32) ** lenpen, 1e-6
                )
                eos_norm = jnp.where(can_finish, norm, NEG_INF)
                # gather candidate token rows [B, NCand, L+1]
                flat_beam = (
                    jnp.arange(B)[:, None] * K + beam_idx
                ).reshape(-1)
                cand_tokens = jnp.take(
                    tokens.reshape(BK, -1), flat_beam, axis=0
                ).reshape(B, tok_idx.shape[1], -1)
                cand_tokens = jax.lax.dynamic_update_slice_in_dim(
                    cand_tokens,
                    tok_idx[:, :, None],
                    step + 1,
                    axis=2,
                )
                all_scores = jnp.concatenate([fin_scores, eos_norm], axis=1)
                all_raw = jnp.concatenate(
                    [fin_raw, jnp.where(can_finish, top_scores, NEG_INF)],
                    axis=1,
                )
                all_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
                all_lens = jnp.concatenate(
                    [
                        fin_lens,
                        jnp.full((B, tok_idx.shape[1]), new_len, jnp.int32),
                    ],
                    axis=1,
                )
                fin_scores, keep = jax.lax.top_k(all_scores, K)
                fin_tokens = jnp.take_along_axis(
                    all_tokens, keep[:, :, None], axis=1
                )
                fin_raw = jnp.take_along_axis(all_raw, keep, axis=1)
                fin_lens = jnp.take_along_axis(all_lens, keep, axis=1)

                # --- continue with best K non-eos candidates ---------------
                cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
                if G > 1:
                    # keep the group structure: group g's continuing beams
                    # come from group g's own 2*Kg candidate slice
                    Kg = K // G
                    ns_parts, sel_parts = [], []
                    for g in range(G):
                        s_g, sel_g = jax.lax.top_k(
                            cont_scores[:, 2 * Kg * g : 2 * Kg * (g + 1)], Kg
                        )
                        ns_parts.append(s_g)
                        sel_parts.append(sel_g + 2 * Kg * g)
                    new_scores = jnp.concatenate(ns_parts, axis=1)
                    sel = jnp.concatenate(sel_parts, axis=1)
                elif nc > 0:
                    # dynamic beam allocation (Post & Vilar 2018): reserve a
                    # slot for the best candidate of every constraint-progress
                    # bank so hypotheses making progress are never crowded
                    # out; remaining slots go to the global best
                    viable = cont_scores > NEG_INF / 2
                    M = nc * cl
                    bank = jnp.clip(cand_met, 0, M)
                    bank_max = (
                        jnp.full((B, M + 1), NEG_INF)
                        .at[jnp.arange(B)[:, None], bank]
                        .max(cont_scores)
                    )
                    is_bank_best = viable & (
                        cont_scores
                        >= jnp.take_along_axis(bank_max, bank, axis=1) - 1e-6
                    )
                    sel_key = jnp.where(
                        is_bank_best, cont_scores + 1e7, cont_scores
                    )
                    _, sel = jax.lax.top_k(sel_key, K)
                    new_scores = jnp.take_along_axis(cont_scores, sel, axis=1)
                    ptr = jnp.take_along_axis(
                        cand_ptr, sel[:, :, None], axis=1
                    )
                else:
                    new_scores, sel = jax.lax.top_k(cont_scores, K)  # [B, K]
                sel_beam = jnp.take_along_axis(beam_idx, sel, axis=1)
                sel_tok = jnp.take_along_axis(tok_idx, sel, axis=1)
                flat_sel = (jnp.arange(B)[:, None] * K + sel_beam).reshape(-1)
                tokens = jnp.take(
                    tokens.reshape(BK, -1), flat_sel, axis=0
                ).reshape(B, K, -1)
                tokens = jax.lax.dynamic_update_slice_in_dim(
                    tokens, sel_tok[:, :, None], step + 1, axis=2
                )
                state = tuple(
                    adp.reorder(st_i, flat_sel)
                    for adp, st_i in zip(adapters, state)
                )
                if lm_state is not None:
                    lm_state = lm_adapter.reorder(lm_state, flat_sel)
                return (
                    tokens,
                    new_scores,
                    state,
                    lm_state,
                    fin_tokens,
                    fin_scores,
                    fin_raw,
                    fin_lens,
                    ptr,
                ), None

            carry = (
                tokens0,
                scores0,
                state,
                lm_state,
                fin_tokens0,
                fin_scores0,
                fin_raw0,
                fin_lens0,
                ptr0,
            )
            carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(max_len))
            (
                tokens,
                scores,
                _,
                _,
                fin_tokens,
                fin_scores,
                fin_raw,
                fin_lens,
                _,
            ) = carry
            # fall back to unfinished best beam when nothing finalized
            no_fin = fin_scores[:, 0] <= NEG_INF / 2
            unfin_norm = scores / jnp.maximum(
                jnp.float32(max_len) ** lenpen, 1e-6
            )
            fin_scores = jnp.where(no_fin[:, None], unfin_norm, fin_scores)
            fin_tokens = jnp.where(
                no_fin[:, None, None], tokens, fin_tokens
            )
            fin_lens = jnp.where(
                no_fin[:, None], jnp.full((B, K), max_len + 1), fin_lens
            )
            return fin_tokens, fin_scores, fin_raw, fin_lens

        return jax.jit(run)

    # ------------------------------------------------------------------
    def decode(
        self, variables, batch, prefix_tokens=None, constraints=None
    ) -> List[List[Dict[str, Any]]]:
        """``constraints``: optional [B, NC, CL] int array of token phrases
        (pad-padded) that every finished hypothesis must contain
        (lexically-constrained decoding, fairseq search.py:210)."""
        src_frames = jnp.asarray(batch["src_frames"])
        src_lengths = jnp.asarray(batch["src_lengths"])
        T = src_frames.shape[1]
        max_len = int(self.max_len_a * T + self.max_len_b)
        max_len = max(min(max_len, 1024), 2)
        if prefix_tokens is not None:
            prefix_tokens = jnp.asarray(prefix_tokens, jnp.int32)
            pref_len = int(prefix_tokens.shape[1])
        else:
            prefix_tokens = jnp.zeros((src_frames.shape[0], 0), jnp.int32)
            pref_len = 0
        if constraints is not None:
            constraints = jnp.asarray(constraints, jnp.int32)
            nc, cl = int(constraints.shape[1]), int(constraints.shape[2])
        else:
            nc = cl = 0
        key = (src_frames.shape, max_len, pref_len, nc, cl)
        if key not in self._jitted:
            self._jitted[key] = self._search_fn(max_len, pref_len, nc, cl)
        variables_list = (
            variables if isinstance(variables, (list, tuple)) else [variables]
        )
        fin_tokens, fin_scores, fin_raw, fin_lens = self._jitted[key](
            variables_list,
            self.lm_variables,
            src_frames,
            src_lengths,
            prefix_tokens,
            constraints,
        )
        fin_tokens = np.asarray(fin_tokens)
        fin_scores = np.asarray(fin_scores)
        fin_lens = np.asarray(fin_lens)
        results = []
        for b in range(fin_tokens.shape[0]):
            hypos = []
            for k in range(fin_tokens.shape[1]):
                L = int(fin_lens[b, k])
                toks = fin_tokens[b, k, 1 : L + 1]  # strip leading eos
                toks = toks[toks != self.pad]
                if len(toks) and toks[-1] == self.eos:
                    toks = toks[:-1]
                hypos.append(
                    {
                        "tokens": toks.astype(np.int32),
                        "score": float(fin_scores[b, k]),
                    }
                )
            results.append(hypos)
        return results

    generate = decode
