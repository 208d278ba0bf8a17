"""Look-ahead word language model for subword-level beam search.

Rebuild of espresso/models/tensorized_lookahead_language_model.py:18 (the
vectorized form of external_language_model.py:27, arXiv:1808.02608): during
subword beam search a *word-level* LM provides scores by walking a lexical
prefix tree with pure gathers:

  * at a word boundary (``<space>``) the word LM is re-queried with the
    completed word and its cumulative-probability vector is refreshed
    (Eqn. 15 case 1 — the <space> emission gets P(word|h)/lookahead-mass);
  * inside a word, the transition to each child subword scores the ratio of
    word-probability mass under the child's word range to the current node's
    (case 2), via two gathers into the cumsum vector;
  * out-of-tree transitions get ``oov_penalty * P(<unk>|h)`` in open-vocab
    mode (case 3) or die (closed), and out-of-tree nodes pass through with
    probability 1 (case 4).

State = (word-LM carry, cumsum_probs [B, V_word], nodes [B]); everything is
explicit, so beam reorder is one gather per leaf. ``step`` returns
log-probabilities (NOT logits) over the subword vocabulary — consumers must
not re-normalize (``returns_log_probs = True``).

``MultiLevelLanguageModel`` (external_language_model.py:306) combines a
subword LM inside words with the word LM at boundaries.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.tools.prefix_tree import TensorizedPrefixTree

ZERO = 1e-10  # reference's log(0) guard


class TensorizedLookaheadLanguageModel:
    """Adapter-compatible look-ahead word LM (init_state/step/reorder)."""

    returns_log_probs = True

    def __init__(
        self,
        word_lm,  # LSTMLanguageModel module
        word_lm_variables,
        word_dict,
        subword_dict,
        oov_penalty: float = 1e-4,
        open_vocab: bool = True,
        subword_tokenizer=None,
    ):
        self.word_lm = word_lm
        self.word_lm_variables = word_lm_variables
        self.word_dict = word_dict
        self.subword_dict = subword_dict
        self.oov_penalty = oov_penalty
        self.open_vocab = open_vocab
        tree = TensorizedPrefixTree.build(
            word_dict, subword_dict, subword_tokenizer
        )
        self.tree_children = jnp.asarray(tree.children)
        self.tree_prev_subword = jnp.asarray(tree.prev_subword_idx)
        self.tree_word_idx = jnp.asarray(tree.word_idx)
        self.tree_word_set = jnp.asarray(tree.word_set_idx)
        self.none_id = tree.none_id
        self.root_id = tree.root_id
        self.word_pad = word_dict.pad()
        self.word_eos = word_dict.eos()
        self.word_unk = word_dict.unk()
        self.sub_space = subword_dict.space()
        self.sub_pad = subword_dict.pad()
        self.sub_eos = subword_dict.eos()
        self.sub_vocab = len(subword_dict)

    # -- adapter API ---------------------------------------------------------
    def init_state(self, lm_variables, enc, batch_k: int, max_len: int):
        """First step: query the word LM with <eos> (reference: the first
        subword input must be <eos>)."""
        variables = lm_variables or self.word_lm_variables
        carry = self.word_lm.apply(variables, batch_k, method="init_carry")
        w = jnp.full((batch_k,), self.word_eos, jnp.int32)
        logits, carry = self.word_lm.apply(
            variables, w, carry, method="decode_step"
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        cumsum = jnp.cumsum(probs, axis=-1)
        nodes = jnp.full((batch_k,), self.root_id, jnp.int32)
        return (carry, cumsum, nodes, probs)

    def step(self, lm_variables, tokens, state, enc=None, step_idx=None):
        """tokens: [B] previous subword. Returns (log_probs [B, sub_vocab],
        new_state, None)."""
        variables = lm_variables or self.word_lm_variables
        carry, cumsum, nodes, _ = state
        B = tokens.shape[0]
        space_mask = tokens == self.sub_space  # [B]
        # the first decode step feeds <eos>: the init_state already performed
        # the word-LM <eos> query (reference first-step branch), so <eos> rows
        # skip both the re-query and the tree transition
        eos_mask = tokens == self.sub_eos

        # query the word LM with the word completed at this node (only rows at
        # a word boundary commit the step; others restore their carry)
        w = self.tree_word_idx[nodes]
        w = jnp.where(w < 0, self.word_unk, w).astype(jnp.int32)
        logits, new_carry = self.word_lm.apply(
            variables, w, carry, method="decode_step"
        )
        lm_probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        def masked(new, old):
            shape = [1] * new.ndim
            axis = 1 if new.ndim == 3 else 0
            shape[axis] = B
            return jnp.where(space_mask.reshape(shape), new, old)

        carry = jax.tree_util.tree_map(masked, new_carry, carry)
        cumsum = jnp.where(
            space_mask[:, None], jnp.cumsum(lm_probs, axis=-1), cumsum
        )

        # tree transition: intra-word -> child; <space> -> root; OOV -> none;
        # <eos> (first step) -> stay
        prev_children = self.tree_children[nodes]  # [B, C]
        prev_tokens = self.tree_prev_subword[prev_children]  # [B, C]
        match = prev_tokens == tokens[:, None]
        new_nodes = (prev_children * match).sum(axis=1).astype(jnp.int32)
        new_nodes = jnp.where(space_mask, self.root_id, new_nodes)
        nodes = jnp.where(eos_mask, nodes, new_nodes)

        all_children = self.tree_children[nodes]  # [B, C]

        # -- out_probs init (cases 3/4) --------------------------------------
        if self.open_vocab:
            unk_mass = jnp.take_along_axis(
                cumsum, jnp.full((B, 1), self.word_unk), axis=1
            ) - jnp.take_along_axis(
                cumsum, jnp.full((B, 1), self.word_unk - 1), axis=1
            )
            out_probs = jnp.broadcast_to(
                self.oov_penalty * unk_mass, (B, self.sub_vocab)
            )
            space_eos_mask = space_mask | (tokens == self.sub_eos)
            out_probs = jnp.where(
                (jnp.arange(self.sub_vocab)[None, :] == self.sub_space)
                & space_eos_mask[:, None],
                ZERO,
                out_probs,
            )
            out_probs = jnp.where(
                (jnp.arange(self.sub_vocab)[None, :] == self.sub_eos)
                & (~space_mask)[:, None],
                ZERO,
                out_probs,
            )
            out_probs = jnp.where(
                (nodes == self.none_id)[:, None], 1.0, out_probs
            )
        else:
            out_probs = jnp.full((B, self.sub_vocab), ZERO)

        # -- node mass (denominator) ------------------------------------------
        left = self.tree_word_set[nodes, 0][:, None]
        right = self.tree_word_set[nodes, 1][:, None]
        sum_probs = jnp.where(
            (nodes != self.none_id) & (nodes != self.root_id),
            (
                jnp.take_along_axis(cumsum, right, axis=1)
                - jnp.take_along_axis(cumsum, left, axis=1)
            )[:, 0],
            1.0,
        )  # [B]

        # -- case 2: transitions to children ----------------------------------
        c_left = self.tree_word_set[all_children, 0]
        c_right = self.tree_word_set[all_children, 1]
        child_mass = jnp.take_along_axis(cumsum, c_right, axis=1) - (
            jnp.take_along_axis(cumsum, c_left, axis=1)
        )  # [B, C]
        child_probs = child_mass / jnp.maximum(sum_probs[:, None], ZERO)
        child_probs = jnp.where(sum_probs[:, None] < ZERO, ZERO, child_probs)
        next_tokens = self.tree_prev_subword[all_children]  # [B, C]
        # scatter child probs into the subword vocab
        out_probs = jax.vmap(lambda op, idx, val: op.at[idx].set(val))(
            out_probs, next_tokens, child_probs
        )
        out_probs = out_probs.at[:, self.sub_pad].set(ZERO)

        # -- case 1: <space> emission = word probability ----------------------
        word_idx = self.tree_word_idx[nodes]
        is_word_end = word_idx >= 0
        safe_idx = jnp.where(word_idx < 0, 1, word_idx)[:, None]
        word_probs = (
            jnp.take_along_axis(cumsum, safe_idx, axis=1)
            - jnp.take_along_axis(cumsum, safe_idx - 1, axis=1)
        )[:, 0] / jnp.maximum(sum_probs, ZERO)
        word_probs = jnp.where(sum_probs < ZERO, ZERO, word_probs)
        out_probs = out_probs.at[:, self.sub_space].set(
            jnp.where(is_word_end, word_probs, out_probs[:, self.sub_space])
        )

        out_logprobs = jnp.log(jnp.maximum(out_probs, ZERO))
        # <eos> after <space> scores the word LM's <eos>
        out_logprobs = out_logprobs.at[:, self.sub_eos].set(
            jnp.where(
                space_mask,
                jnp.log(jnp.maximum(lm_probs[:, self.word_eos], ZERO)),
                out_logprobs[:, self.sub_eos],
            )
        )
        return out_logprobs, (carry, cumsum, nodes, lm_probs), None

    def reorder(self, state, idx):
        carry, cumsum, nodes, lm_probs = state
        h, c, feed, prev = carry
        carry = (
            jnp.take(h, idx, axis=1),
            jnp.take(c, idx, axis=1),
            jnp.take(feed, idx, axis=0),
            jnp.take(prev, idx, axis=0),
        )
        return (
            carry,
            jnp.take(cumsum, idx, axis=0),
            jnp.take(nodes, idx, axis=0),
            jnp.take(lm_probs, idx, axis=0),
        )


class MultiLevelLanguageModel:
    """Subword LM + word LM combination (external_language_model.py:306):
    subword-LM probability inside words (weighted by ``subwordlm_weight``),
    corrected at word boundaries by the word-LM probability of the completed
    word."""

    returns_log_probs = True

    def __init__(
        self,
        word_lm,
        word_lm_variables,
        subword_lm,
        subword_lm_variables,
        word_dict,
        subword_dict,
        subwordlm_weight: float = 0.8,
        oov_penalty: float = 1e-4,
        open_vocab: bool = True,
        subword_tokenizer=None,
    ):
        self.lookahead = TensorizedLookaheadLanguageModel(
            word_lm,
            word_lm_variables,
            word_dict,
            subword_dict,
            oov_penalty=oov_penalty,
            open_vocab=open_vocab,
            subword_tokenizer=subword_tokenizer,
        )
        self.subword_lm = subword_lm
        self.subword_lm_variables = subword_lm_variables
        self.subwordlm_weight = subwordlm_weight
        self.sub_space = subword_dict.space()
        self.sub_eos = subword_dict.eos()

    def init_state(self, lm_variables, enc, batch_k: int, max_len: int):
        la_state = self.lookahead.init_state(None, enc, batch_k, max_len)
        sub_carry = self.subword_lm.apply(
            self.subword_lm_variables, batch_k, method="init_carry"
        )
        # accumulated (weighted) subword log-prob inside the current word, and
        # the previous step's subword distribution (to charge the consumed
        # token at the next step)
        acc = jnp.zeros((batch_k,), jnp.float32)
        prev_lp = jnp.zeros((batch_k, len(self.lookahead.subword_dict)), jnp.float32)
        return (la_state, sub_carry, acc, prev_lp)

    def step(self, lm_variables, tokens, state, enc=None, step_idx=None):
        la_state, sub_carry, acc, prev_lp = state
        space_mask = tokens == self.sub_space
        # charge the subword just consumed to the in-word accumulator
        consumed = jnp.take_along_axis(prev_lp, tokens[:, None], axis=1)[:, 0]
        acc = jnp.where(space_mask, 0.0, acc + consumed)

        la_lp, la_state, _ = self.lookahead.step(None, tokens, la_state)
        sub_logits, sub_carry = self.subword_lm.apply(
            self.subword_lm_variables, tokens, sub_carry, method="decode_step"
        )
        sub_lp = (
            jax.nn.log_softmax(sub_logits.astype(jnp.float32), -1)
            * self.subwordlm_weight
        )
        # inside a word: subword-LM scores (accumulated in acc). At <space>:
        # the word LM's log P(word|h) replaces the accumulated subword mass,
        # so the <space> emission scores  log P_word - acc .
        out = sub_lp
        correction = la_lp[:, self.sub_space] - acc
        out = out.at[:, self.sub_space].set(correction)
        out = out.at[:, self.sub_eos].set(la_lp[:, self.sub_eos])
        return out, (la_state, sub_carry, acc, sub_lp), None

    def reorder(self, state, idx):
        la_state, sub_carry, acc, prev_lp = state
        la_state = self.lookahead.reorder(la_state, idx)
        h, c, feed, prev = sub_carry
        sub_carry = (
            jnp.take(h, idx, axis=1),
            jnp.take(c, idx, axis=1),
            jnp.take(feed, idx, axis=0),
            jnp.take(prev, idx, axis=0),
        )
        return (
            la_state,
            sub_carry,
            jnp.take(acc, idx, axis=0),
            jnp.take(prev_lp, idx, axis=0),
        )
