"""Tests for the lexical prefix tree and the look-ahead word LM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.data.dictionary import AsrDictionary
from espresso_tpu.models.lstm_lm import LSTMLanguageModel, LSTMLMConfig
from espresso_tpu.models.lookahead_lm import (
    MultiLevelLanguageModel,
    TensorizedLookaheadLanguageModel,
)
from espresso_tpu.tools.prefix_tree import TensorizedPrefixTree


def _dicts():
    # word dict in lexical order (reference assumption)
    word_dict = AsrDictionary()
    for w in ["ab", "abc", "b", "ba"]:
        word_dict.add_symbol(w)
    sub_dict = AsrDictionary()
    sub_dict.add_symbol("<space>")
    sub_dict.space_index = sub_dict.indices["<space>"]
    for ch in "abc":
        sub_dict.add_symbol(ch)
    return word_dict, sub_dict


def test_prefix_tree_structure():
    word_dict, sub_dict = _dicts()
    tree = TensorizedPrefixTree.build(word_dict, sub_dict)
    a, b, c = sub_dict.index("a"), sub_dict.index("b"), sub_dict.index("c")
    root = tree.root_id
    # root has children 'a' and 'b'
    root_children = tree.children[root]
    root_tokens = sorted(
        tree.prev_subword_idx[cid] for cid in root_children if cid != 0
    )
    assert root_tokens == sorted([a, b])
    # follow a -> b: word "ab" is terminal
    node_a = next(
        cid for cid in root_children if tree.prev_subword_idx[cid] == a
    )
    node_ab = next(
        cid for cid in tree.children[node_a] if cid and tree.prev_subword_idx[cid] == b
    )
    assert tree.word_idx[node_ab] == word_dict.index("ab")
    # word set of node 'a' covers words ab(3) and abc(4): (first-1, last)
    ws = tree.word_set_idx[node_a]
    assert ws[0] == word_dict.index("ab") - 1 and ws[1] == word_dict.index("abc")


def _word_lm(word_dict):
    lm = LSTMLanguageModel(
        LSTMLMConfig(
            vocab_size=len(word_dict),
            embed_dim=8,
            hidden_size=12,
            out_embed_dim=12,
            num_layers=1,
            dropout=0.0,
            is_wordlm=True,
        )
    )
    v = lm.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 3), jnp.int32)
    )
    return lm, v


def test_lookahead_lm_distributions():
    word_dict, sub_dict = _dicts()
    lm, lmv = _word_lm(word_dict)
    la = TensorizedLookaheadLanguageModel(
        lm, lmv, word_dict, sub_dict, oov_penalty=1e-4, open_vocab=True
    )
    B = 2
    state = la.init_state(None, None, B, 10)
    # first input token is <eos> (decoder convention)
    tokens = jnp.full((B,), sub_dict.eos(), jnp.int32)
    lp, state, _ = la.step(None, tokens, state)
    lp = np.asarray(lp)
    assert lp.shape == (B, len(sub_dict))
    probs = np.exp(lp)
    a, b, c = sub_dict.index("a"), sub_dict.index("b"), sub_dict.index("c")
    # from root: 'a' covers {ab, abc}, 'b' covers {b, ba}; c only via OOV mass
    assert probs[0, a] > probs[0, c]
    assert probs[0, b] > probs[0, c]
    # child masses from root should sum close to total lexicon mass / 1.0
    # (root sum_probs = 1)
    # now descend 'a'
    lp2, state, _ = la.step(None, jnp.full((B,), a, jnp.int32), state)
    probs2 = np.exp(np.asarray(lp2))
    # at node 'a', next valid is 'b' (toward ab/abc); 'a'/'c' only OOV mass
    assert probs2[0, b] > probs2[0, a]
    assert probs2[0, b] > probs2[0, c]
    # <space> keeps only the OOV baseline (node 'a' is not a word end)
    assert probs2[0, sub_dict.space()] <= 1e-4

    # descend 'b' -> node 'ab' is a word end: <space> gets word prob
    lp3, state, _ = la.step(None, jnp.full((B,), b, jnp.int32), state)
    probs3 = np.exp(np.asarray(lp3))
    assert probs3[0, sub_dict.space()] > 1e-6


def test_lookahead_lm_in_beam_search():
    # smoke: wire into BeamSearchDecoder with a tiny acoustic model
    from espresso_tpu.decode.beam_search import BeamSearchDecoder
    from espresso_tpu.models.speech_lstm import (
        SpeechLSTMConfig,
        SpeechLSTMModel,
    )

    word_dict, sub_dict = _dicts()
    lm, lmv = _word_lm(word_dict)
    la = TensorizedLookaheadLanguageModel(lm, lmv, word_dict, sub_dict)

    V = len(sub_dict)
    cfg = SpeechLSTMConfig(
        feat_dim=8,
        vocab_size=V,
        conv_channels=(4,),
        conv_kernel_sizes=((3, 3),),
        conv_strides=((2, 2),),
        encoder_hidden_size=12,
        encoder_layers=1,
        decoder_embed_dim=8,
        decoder_hidden_size=12,
        decoder_out_embed_dim=12,
        decoder_layers=1,
        attention_dim=8,
        dropout=0.0,
    )
    model = SpeechLSTMModel(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((2, 21, 8)).astype(np.float32))
    lengths = jnp.asarray([21, 15])
    prev = jnp.asarray(rng.integers(0, V, (2, 4)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), frames, lengths, prev)

    dec = BeamSearchDecoder(
        model, sub_dict, beam_size=3, max_len_b=12, lm=la, lm_weight=0.9
    )
    out = dec.decode(
        variables,
        {"src_frames": np.asarray(frames), "src_lengths": np.asarray(lengths)},
    )
    assert len(out) == 2 and len(out[0]) == 3
    assert all(np.isfinite(h["score"]) for h in out[0])


def test_multi_level_lm_smoke():
    word_dict, sub_dict = _dicts()
    wlm, wlmv = _word_lm(word_dict)
    slm = LSTMLanguageModel(
        LSTMLMConfig(
            vocab_size=len(sub_dict),
            embed_dim=8,
            hidden_size=12,
            out_embed_dim=12,
            num_layers=1,
            dropout=0.0,
        )
    )
    slmv = slm.init(jax.random.PRNGKey(1), jnp.zeros((2, 3), jnp.int32))
    ml = MultiLevelLanguageModel(
        wlm, wlmv, slm, slmv, word_dict, sub_dict, subwordlm_weight=0.8
    )
    B = 2
    state = ml.init_state(None, None, B, 10)
    tokens = jnp.full((B,), sub_dict.eos(), jnp.int32)
    lp, state, _ = ml.step(None, tokens, state)
    assert np.asarray(lp).shape == (B, len(sub_dict))
    lp2, state, _ = ml.step(
        None, jnp.full((B,), sub_dict.index("a"), jnp.int32), state
    )
    assert np.isfinite(np.asarray(lp2)).any()
