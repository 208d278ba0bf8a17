"""Lattice container + the reference recipe's lattice operations.

Rebuild of the lattice post-processing the reference runs on Kaldi lattice
archives (examples/asr_wsj/run_chain_e2e.sh:218-233):

  * ``lattice-scale --acoustic-scale/--lm-scale/--inv-acoustic-scale`` ->
    :func:`Lattice.scaled`
  * ``lattice-add-penalty --word-ins-penalty`` -> :func:`Lattice.with_penalty`
  * ``lattice-best-path`` -> :func:`best_path` (and the vectorized
    :func:`best_path_sweep` that evaluates the whole local/score.sh
    LMWT x WIP grid in one pass)
  * ``lattice-lmrescore`` / ``lattice-lmrescore-const-arpa``
    (steps/lmrescore.sh, steps/lmrescore_const_arpa.sh) -> :func:`lmrescore`
    — on-the-fly composition with an ARPA n-gram automaton
    (tools/arpa.ArpaLM); subtracting the old LM is the same call at
    ``lm_scale=-1``.

Lattices come from clib/fst_decode.cpp's lattice decoder
(tools/fst_decoder.FstDecoder.decode_lattice): nodes are (frame, graph
state) tokens in frame-major topological order with node 0 = start; arcs
carry separate graph and acoustic costs (tropical), so rescaling and LM
rescoring are exact — the Kaldi lattice semiring contract.

Archive format: one ``.npz`` per dataset with per-utterance key prefixes
(``{utt}/arc_src`` ...), written/read by :func:`write_lattice_archive` /
:func:`read_lattice_archive`.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

INF = np.float32(np.inf)


@dataclass
class Lattice:
    """Pruned decode lattice. Node 0 is the start; nodes are frame-major
    topologically ordered (within-frame epsilon arcs may need fixpoint
    relaxation — see :func:`_forward`). ``node_final`` is +inf for
    non-final nodes; ``arc_il`` keeps pdf-id+1 input labels (0 = eps) for
    alignment consumers; ``arc_ol`` are word ids (0 = eps)."""

    node_frame: np.ndarray  # [N] int32
    node_final: np.ndarray  # [N] float32 (+inf = non-final)
    arc_src: np.ndarray  # [A] int32
    arc_dst: np.ndarray  # [A] int32
    arc_il: np.ndarray  # [A] int32
    arc_ol: np.ndarray  # [A] int32
    arc_g: np.ndarray  # [A] float32 graph cost
    arc_a: np.ndarray  # [A] float32 acoustic cost

    @property
    def num_nodes(self) -> int:
        return len(self.node_frame)

    @property
    def num_arcs(self) -> int:
        return len(self.arc_src)

    def scaled(
        self,
        acoustic_scale: float = 1.0,
        lm_scale: float = 1.0,
        inv_acoustic_scale: Optional[float] = None,
    ) -> "Lattice":
        """Kaldi ``lattice-scale`` semantics: acoustic costs scale by
        ``acoustic_scale`` (or ``1/inv_acoustic_scale``), graph costs by
        ``lm_scale``. Final costs are graph costs."""
        if inv_acoustic_scale is not None:
            assert acoustic_scale == 1.0, "pass only one acoustic scale"
            acoustic_scale = 1.0 / inv_acoustic_scale
        return replace(
            self,
            arc_a=(self.arc_a * np.float32(acoustic_scale)),
            arc_g=(self.arc_g * np.float32(lm_scale)),
            node_final=np.where(
                np.isfinite(self.node_final),
                self.node_final * np.float32(lm_scale),
                INF,
            ).astype(np.float32),
        )

    def with_penalty(self, word_ins_penalty: float) -> "Lattice":
        """Kaldi ``lattice-add-penalty``: add ``word_ins_penalty`` to the
        graph cost of every arc with a non-epsilon output label."""
        pen = np.where(self.arc_ol != 0, np.float32(word_ins_penalty), 0.0)
        return replace(self, arc_g=(self.arc_g + pen).astype(np.float32))

    def to_dict(self) -> Dict[str, np.ndarray]:
        return {
            "node_frame": self.node_frame,
            "node_final": self.node_final,
            "arc_src": self.arc_src,
            "arc_dst": self.arc_dst,
            "arc_il": self.arc_il,
            "arc_ol": self.arc_ol,
            "arc_g": self.arc_g,
            "arc_a": self.arc_a,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, np.ndarray]) -> "Lattice":
        return cls(**{k: np.asarray(v) for k, v in d.items()})


def _arc_costs(
    lat: Lattice,
    acoustic_scale,
    lm_scale,
    word_ins_penalty,
) -> np.ndarray:
    """Total arc costs, broadcast over a sweep axis: [A, n_sweep]. Each of
    acoustic_scale / lm_scale / word_ins_penalty may be a scalar or a 1-D
    sweep array (broadcast together)."""
    ac = np.atleast_1d(np.asarray(acoustic_scale, np.float32))
    lm = np.atleast_1d(np.asarray(lm_scale, np.float32))
    wip = np.atleast_1d(np.asarray(word_ins_penalty, np.float32))
    n = max(len(ac), len(lm), len(wip))
    ac = np.broadcast_to(ac, (n,))
    lm = np.broadcast_to(lm, (n,))
    wip = np.broadcast_to(wip, (n,))
    has_word = (lat.arc_ol != 0).astype(np.float32)[:, None]
    c = (
        lat.arc_g[:, None] * lm[None, :]
        + lat.arc_a[:, None] * ac[None, :]
        + has_word * wip[None, :]
    )
    return c


def _forward(
    lat: Lattice, costs: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Shortest-path alphas over the lattice DAG for every sweep column.

    costs: [A, S]. Returns (alpha [N, S], argmin incoming arc [N, S] int32,
    -1 at the start). Nodes are frame-major; within-frame epsilon arcs are
    relaxed to fixpoint per frame (eps cycles have non-negative cost, so
    strict improvement terminates)."""
    N, S = lat.num_nodes, costs.shape[1]
    alpha = np.full((N, S), INF, np.float32)
    back = np.full((N, S), -1, np.int32)
    alpha[0] = 0.0
    frames = lat.node_frame
    src_f = frames[lat.arc_src]
    is_eps_frame = frames[lat.arc_dst] == src_f  # within-frame (eps) arcs
    order = np.unique(frames)
    for fr in order:
        in_frame = src_f == fr
        cross = np.nonzero(in_frame & ~is_eps_frame)[0]
        within = np.nonzero(in_frame & is_eps_frame)[0]
        # fixpoint over within-frame arcs
        for _ in range(max(1, len(within))):
            changed = False
            for a in within:
                na = alpha[lat.arc_src[a]] + costs[a]
                m = na < alpha[lat.arc_dst[a]]
                if m.any():
                    d = lat.arc_dst[a]
                    alpha[d] = np.where(m, na, alpha[d])
                    back[d] = np.where(m, a, back[d])
                    changed = True
            if not changed:
                break
        for a in cross:
            na = alpha[lat.arc_src[a]] + costs[a]
            m = na < alpha[lat.arc_dst[a]]
            if m.any():
                d = lat.arc_dst[a]
                alpha[d] = np.where(m, na, alpha[d])
                back[d] = np.where(m, a, back[d])
    return alpha, back


def best_path_sweep(
    lat: Lattice,
    acoustic_scale: float = 1.0,
    lm_scale=1.0,
    word_ins_penalty=0.0,
) -> List[Tuple[List[int], float]]:
    """``lattice-best-path`` over a sweep of (lm_scale, word_ins_penalty)
    points in ONE forward pass (vectorized over the sweep axis — the
    reference's local/score.sh launches one lattice-best-path process per
    grid point). Returns [(words, total_cost)] per sweep point."""
    costs = _arc_costs(lat, acoustic_scale, lm_scale, word_ins_penalty)
    S = costs.shape[1]
    alpha, back = _forward(lat, costs)
    lm = np.broadcast_to(
        np.atleast_1d(np.asarray(lm_scale, np.float32)), (S,)
    )
    # final costs are graph costs: they scale with lm_scale (lattice-scale
    # applies lm_scale to the whole LatticeWeight graph component)
    finals = lat.node_final[:, None] * lm[None, :]
    finals = np.where(np.isfinite(finals), finals, INF)
    total = alpha + finals
    out: List[Tuple[List[int], float]] = []
    for s in range(S):
        n = int(np.argmin(total[:, s]))
        if not np.isfinite(total[n, s]):
            out.append(([], float("inf")))
            continue
        words: List[int] = []
        cur = n
        while True:
            a = int(back[cur, s])
            if a < 0:
                break
            if lat.arc_ol[a] != 0:
                words.append(int(lat.arc_ol[a]))
            cur = int(lat.arc_src[a])
        out.append((words[::-1], float(total[n, s])))
    return out


def best_path(
    lat: Lattice,
    acoustic_scale: float = 1.0,
    lm_scale: float = 1.0,
    word_ins_penalty: float = 0.0,
) -> Tuple[List[int], float]:
    """Single-point ``lattice-best-path``: (words, total cost)."""
    return best_path_sweep(
        lat, acoustic_scale, [lm_scale], [word_ins_penalty]
    )[0]


def enumerate_paths(
    lat: Lattice, max_paths: int = 100000
) -> List[Tuple[Tuple[int, ...], float]]:
    """All complete paths as (word tuple, total cost) — the brute-force
    oracle for tests. Epsilon-cycle-safe via a visited-arc bound."""
    out: List[Tuple[Tuple[int, ...], float]] = []
    arcs_from: Dict[int, List[int]] = {}
    for a in range(lat.num_arcs):
        arcs_from.setdefault(int(lat.arc_src[a]), []).append(a)

    def rec(node: int, cost: float, words: List[int], depth: int):
        if len(out) >= max_paths or depth > 4 * lat.num_nodes:
            return
        f = float(lat.node_final[node])
        if np.isfinite(f):
            out.append((tuple(words), cost + f))
        for a in arcs_from.get(node, []):
            ol = int(lat.arc_ol[a])
            rec(
                int(lat.arc_dst[a]),
                cost + float(lat.arc_g[a]) + float(lat.arc_a[a]),
                words + [ol] if ol else words,
                depth + 1,
            )

    rec(0, 0.0, [], 0)
    return out


def lmrescore(
    lat: Lattice,
    lm,
    id2word: Dict[int, str],
    lm_scale: float = 1.0,
) -> Lattice:
    """Compose the lattice with an ARPA n-gram automaton on output word
    labels, adding ``lm_scale * LM cost`` (natural-log tropical, matching
    Kaldi G.fst) to graph costs — ``lattice-lmrescore --lm-scale``.

    Subtracting the OLD LM (steps/lmrescore.sh mode 3's first pass) is the
    same call with ``lm_scale=-1`` and the old ARPA. Composite states are
    (lattice node, LM history); epsilon arcs pass the history through.
    ``lm`` is a tools.arpa.ArpaLM; sentence-end probability is folded into
    final costs.
    """
    start_hist = lm.initial_state()
    # composite state -> new node id, BFS in discovery order (keeps the
    # frame-major topology: frames only grow along arcs)
    comp_ids: Dict[Tuple[int, object], int] = {(0, start_hist): 0}
    todo: List[Tuple[int, object]] = [(0, start_hist)]
    node_frame = [int(lat.node_frame[0])]
    node_final = [INF]  # filled below
    arcs_from: Dict[int, List[int]] = {}
    for a in range(lat.num_arcs):
        arcs_from.setdefault(int(lat.arc_src[a]), []).append(a)
    n_src: List[int] = []
    n_dst: List[int] = []
    n_il: List[int] = []
    n_ol: List[int] = []
    n_g: List[float] = []
    n_a: List[float] = []

    def get_id(node: int, hist) -> int:
        key = (node, hist)
        if key not in comp_ids:
            comp_ids[key] = len(node_frame)
            node_frame.append(int(lat.node_frame[node]))
            node_final.append(INF)
            todo.append(key)
        return comp_ids[key]

    qi = 0
    while qi < len(todo):
        node, hist = todo[qi]
        cid = comp_ids[(node, hist)]
        qi += 1
        f = float(lat.node_final[node])
        if np.isfinite(f):
            node_final[cid] = np.float32(
                f + lm_scale * lm.final_cost(hist)
            )
        for a in arcs_from.get(node, []):
            ol = int(lat.arc_ol[a])
            g = float(lat.arc_g[a])
            if ol == 0:
                nhist = hist
            else:
                word = id2word.get(ol)
                cost, nhist = lm.step_cost(hist, word)
                g = g + lm_scale * cost
            did = get_id(int(lat.arc_dst[a]), nhist)
            n_src.append(cid)
            n_dst.append(did)
            n_il.append(int(lat.arc_il[a]))
            n_ol.append(ol)
            n_g.append(g)
            n_a.append(float(lat.arc_a[a]))

    return Lattice(
        node_frame=np.asarray(node_frame, np.int32),
        node_final=np.asarray(node_final, np.float32),
        arc_src=np.asarray(n_src, np.int32),
        arc_dst=np.asarray(n_dst, np.int32),
        arc_il=np.asarray(n_il, np.int32),
        arc_ol=np.asarray(n_ol, np.int32),
        arc_g=np.asarray(n_g, np.float32),
        arc_a=np.asarray(n_a, np.float32),
    )


def score_sweep(
    lats: Dict[str, Lattice],
    refs: Dict[str, str],
    id2word: Dict[int, str],
    lmwts: Iterable[int] = range(7, 18),
    wips: Iterable[float] = (0.0, 0.5, 1.0),
    pre_acoustic_scale: float = 1.0,
):
    """The reference's scoring stage (local/score.sh + utils/best_wer.sh):
    for every (LMWT, word-insertion-penalty) grid point, best-path every
    lattice at ``acoustic_scale = pre_acoustic_scale / LMWT`` (the recipe
    pre-scales lattices by 10.0 then sweeps --inv-acoustic-scale=LMWT) plus
    the penalty, score WER against ``refs``, and return
    (results, best_key): ``results[(lmwt, wip)] = {"wer": float,
    "scorer": Scorer, "hypos": {utt: words}}`` with the whole grid
    evaluated in ONE vectorized forward pass per lattice."""
    from espresso_tpu.tools.wer import Scorer

    grid = [(int(l), float(w)) for l in lmwts for w in wips]
    ac = np.asarray(
        [pre_acoustic_scale / l for l, _ in grid], np.float32
    )
    wip = np.asarray([w for _, w in grid], np.float32)
    hypos: Dict[Tuple[int, float], Dict[str, str]] = {g: {} for g in grid}
    for utt, lat in lats.items():
        res = best_path_sweep(
            lat, acoustic_scale=ac, lm_scale=1.0, word_ins_penalty=wip
        )
        for g, (words, _cost) in zip(grid, res):
            hypos[g][utt] = " ".join(
                id2word.get(i, f"<{i}>") for i in words
            )
    results = {}
    best_key, best_wer = None, np.inf
    for g in grid:
        scorer = Scorer()
        for utt, hyp in hypos[g].items():
            if utt in refs:
                scorer.add_evaluation(utt, refs[utt], hyp)
        wer = scorer.wer()
        results[g] = {"wer": wer, "scorer": scorer, "hypos": hypos[g]}
        if wer < best_wer:
            best_key, best_wer = g, wer
    return results, best_key


def write_lattice_archive(path: str, lats: Dict[str, Lattice]) -> None:
    """One compressed npz per dataset, ``{utt}/{field}`` keys."""
    payload = {}
    for utt, lat in lats.items():
        assert "/" not in utt, utt
        for k, v in lat.to_dict().items():
            payload[f"{utt}/{k}"] = v
    np.savez_compressed(path, **payload)


def read_lattice_archive(path: str) -> Dict[str, Lattice]:
    data = np.load(path)
    utts: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        utt, field = key.rsplit("/", 1)
        utts.setdefault(utt, {})[field] = data[key]
    return {u: Lattice.from_dict(d) for u, d in utts.items()}
