"""Tokenizers / subword encoders.

Rebuild of fairseq/data/encoders + espresso/data/encoders/characters_asr.py:31:
the char tokenizer inserts ``<space>`` between words (with optional trailing
space needed by the look-ahead word LM to detect word boundaries), and a
sentencepiece wrapper is provided when the package is available.
"""

from __future__ import annotations

from typing import Optional

from espresso_tpu.registry import TOKENIZERS


@TOKENIZERS.register("characters_asr")
class CharactersAsr:
    """Char-level tokenization with <space> separators
    (espresso/data/encoders/characters_asr.py)."""

    def __init__(self, space_symbol: str = "<space>", ends_with_space: bool = True):
        self.space_symbol = space_symbol
        self.ends_with_space = ends_with_space

    def encode(self, line: str) -> str:
        words = line.strip().split()
        chars = f" {self.space_symbol} ".join(" ".join(list(w)) for w in words)
        if self.ends_with_space:
            chars += f" {self.space_symbol}"
        return chars

    def decode(self, line: str) -> str:
        tokens = line.strip().split()
        words, cur = [], []
        for tok in tokens:
            if tok == self.space_symbol:
                if cur:
                    words.append("".join(cur))
                cur = []
            else:
                cur.append(tok)
        if cur:
            words.append("".join(cur))
        return " ".join(words)


@TOKENIZERS.register("sentencepiece")
class SentencepieceBPE:
    def __init__(self, model_path: str):
        try:
            import sentencepiece as spm
        except ImportError as e:
            raise ImportError("sentencepiece not available in this image") from e
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(model_path)

    def encode(self, line: str) -> str:
        return " ".join(self.sp.EncodeAsPieces(line))

    def decode(self, line: str) -> str:
        return self.sp.DecodePieces(line.split())


def build_tokenizer(name: Optional[str], **kwargs):
    if name is None:
        return None
    return TOKENIZERS.build(name, **kwargs)
