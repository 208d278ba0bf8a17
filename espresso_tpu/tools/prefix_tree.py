"""Lexical prefix tree over a word dictionary, tensorized as int arrays.

Rebuild of espresso/tools/lexical_prefix_tree.py:11 (trie with per-node word
index ranges) and espresso/tools/tensorized_prefix_tree.py:15 (flat arrays
``children[NodeId, MaxChildren]``, ``prev_subword_idx``, ``word_idx``,
``word_set_idx`` with none_id=0, root_id=1) — the array form drives the
batched tree-walk in the look-ahead LM with pure gathers (TPU-native).

Words in the word dictionary must be in lexical order (same assumption as
the reference) so each node's word set is a contiguous [first-1, last] range.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np


class _Node:
    __slots__ = ("children", "word_idx", "word_set")

    def __init__(self):
        self.children = {}
        self.word_idx = -1
        self.word_set = None


def build_trie(word_dict, subword_dict, subword_tokenizer=None) -> _Node:
    special = {word_dict.pad(), word_dict.eos(), word_dict.unk()}
    root = _Node()
    for widx in range(len(word_dict)):
        if widx in special:
            continue
        word = word_dict[widx]
        subwords = (
            subword_tokenizer(word) if subword_tokenizer is not None else list(word)
        )
        if any(subword_dict.index(s) == subword_dict.unk() for s in subwords):
            continue  # skip words with unknown subwords
        children = root.children
        for i, s in enumerate(subwords):
            sidx = subword_dict.index(s)
            if sidx not in children:
                node = _Node()
                node.word_set = (widx - 1, widx)
                children[sidx] = node
            else:
                node = children[sidx]
                node.word_set = (
                    min(node.word_set[0], widx - 1),
                    max(node.word_set[1], widx),
                )
            if i == len(subwords) - 1:
                node.word_idx = widx
            children = node.children
    return root


@dataclass
class TensorizedPrefixTree:
    children: np.ndarray  # [NumNodes, MaxChildren] node ids (0 = none)
    prev_subword_idx: np.ndarray  # [NumNodes] subword leading to this node
    word_idx: np.ndarray  # [NumNodes]; -1 = non-terminal
    word_set_idx: np.ndarray  # [NumNodes, 2] = (first-1, last)
    none_id: int = 0
    root_id: int = 1

    def max_out_degree(self) -> int:
        return self.children.shape[1]

    @staticmethod
    def build(
        word_dict,
        subword_dict,
        subword_tokenizer: Optional[Callable[[str], List[str]]] = None,
    ) -> "TensorizedPrefixTree":
        root = build_trie(word_dict, subword_dict, subword_tokenizer)
        # pre-order traversal (children pushed in descending subword order so
        # they pop ascending — matches reference node numbering)
        nodes: List[Optional[_Node]] = [None]
        node_to_id = {}
        stack = [root]
        max_children = 0
        while stack:
            cur = stack.pop()
            node_to_id[id(cur)] = len(nodes)
            nodes.append(cur)
            max_children = max(max_children, len(cur.children))
            for _, child in sorted(
                cur.children.items(), key=lambda t: t[0], reverse=True
            ):
                stack.append(child)

        n = len(nodes)
        children = np.zeros((n, max(max_children, 1)), dtype=np.int32)
        prev_subword_idx = np.full(n, subword_dict.pad(), dtype=np.int32)
        word_idx = np.full(n, -1, dtype=np.int32)
        word_set_idx = np.full((n, 2), word_dict.pad(), dtype=np.int32)
        for node_id in range(1, n):
            node = nodes[node_id]
            for i, (sidx, child) in enumerate(
                sorted(node.children.items(), key=lambda t: t[0])
            ):
                cid = node_to_id[id(child)]
                children[node_id, i] = cid
                prev_subword_idx[cid] = sidx
            word_idx[node_id] = node.word_idx
            if node.word_set is not None:
                word_set_idx[node_id] = node.word_set
            else:
                word_set_idx[node_id] = [0, len(word_dict) - 1]
        return TensorizedPrefixTree(
            children=children,
            prev_subword_idx=prev_subword_idx,
            word_idx=word_idx,
            word_set_idx=word_set_idx,
        )
