"""In-tree Viterbi decoding over an HCLG-style decoding graph.

Rebuild of the hybrid path's external Kaldi decoding step — the reference
pipes dumped log-likelihoods to ``latgen-faster-mapped`` over a process
boundary (espresso/dump_posteriors.py:148+,
examples/asr_wsj/run_chain_e2e.sh:218-222) and scores the lattice best
path. Here the graph is loaded from OpenFst text format and decoded by a
native token-passing beam decoder (clib/fst_decode.cpp) with the same
control surface (--acoustic-scale / --beam / --max-active) and the
"mapped" label contract: arc input label ``il > 0`` indexes log-likelihood
column ``il - 1``; ``il == 0`` is epsilon.

The host decode runs off-device by design: graph search is pointer-chasing
over an irregular automaton — the one workload in the stack that does not
map to the TPU's MXU/VPU — while the acoustic scores it consumes are
produced on-device (cli/dump_posteriors.py).
"""

from __future__ import annotations

import ctypes
import heapq
import logging
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class DecodingGraph:
    """Arc-CSR decoding graph (tropical semiring, lower cost = better)."""

    arc_offsets: np.ndarray  # [S+1] int32
    arc_dst: np.ndarray  # [A] int32
    arc_il: np.ndarray  # [A] int32 (0 = epsilon, else loglike column + 1)
    arc_ol: np.ndarray  # [A] int32 (0 = epsilon)
    arc_w: np.ndarray  # [A] float32 graph cost
    final_w: np.ndarray  # [S] float32 (+inf = non-final)
    start: int = 0

    @property
    def num_states(self) -> int:
        return len(self.final_w)

    @classmethod
    def from_arcs(
        cls,
        arcs: Sequence[Tuple[int, int, int, int, float]],
        finals: Sequence[Tuple[int, float]],
        start: int = 0,
        num_states: Optional[int] = None,
    ) -> "DecodingGraph":
        """arcs: (src, dst, ilabel, olabel, weight); finals: (state, weight)."""
        if num_states is None:
            hi = start
            for s, d, *_ in arcs:
                hi = max(hi, s, d)
            for s, _ in finals:
                hi = max(hi, s)
            num_states = hi + 1
        arcs = sorted(arcs, key=lambda a: a[0])
        src = np.asarray([a[0] for a in arcs], np.int64)
        offsets = np.zeros(num_states + 1, np.int64)
        np.add.at(offsets, src + 1, 1)
        offsets = np.cumsum(offsets)
        final_w = np.full(num_states, np.inf, np.float32)
        for s, w in finals:
            final_w[s] = w
        return cls(
            arc_offsets=offsets.astype(np.int32),
            arc_dst=np.asarray([a[1] for a in arcs], np.int32),
            arc_il=np.asarray([a[2] for a in arcs], np.int32),
            arc_ol=np.asarray([a[3] for a in arcs], np.int32),
            arc_w=np.asarray([a[4] for a in arcs], np.float32),
            final_w=final_w,
            start=start,
        )

    @classmethod
    def load_text(cls, path: str) -> "DecodingGraph":
        """OpenFst text format: ``src dst il ol [w]`` arc lines and
        ``state [w]`` final lines; the first line's src is the start."""
        arcs: List[Tuple[int, int, int, int, float]] = []
        finals: List[Tuple[int, float]] = []
        start = None
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                if len(parts) >= 4:
                    w = float(parts[4]) if len(parts) > 4 else 0.0
                    arcs.append(
                        (int(parts[0]), int(parts[1]), int(parts[2]),
                         int(parts[3]), w)
                    )
                    if start is None:
                        start = int(parts[0])
                else:
                    w = float(parts[1]) if len(parts) > 1 else 0.0
                    finals.append((int(parts[0]), w))
                    if start is None:
                        start = int(parts[0])
        if start is None:
            raise ValueError(f"empty FST: {path}")
        return cls.from_arcs(arcs, finals, start=start)


def _native_lib() -> Optional[ctypes.CDLL]:
    from espresso_tpu.clib import _build_and_load

    lib = _build_and_load("fst_decode")
    if lib is not None and not getattr(lib, "_configured", False):
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.fst_viterbi_decode.argtypes = [
            i32p, i32p, i32p, i32p, f32p, f32p,
            ctypes.c_int32, ctypes.c_int32,
            f32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            i32p, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ]
        lib.fst_viterbi_decode.restype = ctypes.c_int32
        lib.fst_lattice_decode.argtypes = [
            i32p, i32p, i32p, i32p, f32p, f32p,
            ctypes.c_int32, ctypes.c_int32,
            f32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        lib.fst_lattice_decode.restype = ctypes.c_void_p
        lib.lattice_sizes.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lattice_sizes.restype = None
        lib.lattice_copy.argtypes = [
            ctypes.c_void_p, i32p, f32p, i32p, i32p, i32p, i32p, f32p, f32p,
        ]
        lib.lattice_copy.restype = None
        lib.lattice_free.argtypes = [ctypes.c_void_p]
        lib.lattice_free.restype = None
        lib._configured = True
    return lib


class FstDecoder:
    """Beam Viterbi over a decoding graph; native C++ with NumPy fallback.

    Control surface mirrors the reference decoder invocation
    (run_chain_e2e.sh:218-222): acoustic_scale, beam, max_active.
    """

    def __init__(
        self,
        graph: DecodingGraph,
        acoustic_scale: float = 1.0,
        beam: float = 15.0,
        max_active: int = 7000,
    ):
        self.graph = graph
        self.acoustic_scale = float(acoustic_scale)
        self.beam = float(beam)
        self.max_active = int(max_active)
        self._lib = _native_lib() if os.environ.get(
            "ESPRESSO_FST_NATIVE", "1"
        ) != "0" else None

    def decode(self, loglikes: np.ndarray) -> Tuple[List[int], float, bool]:
        """loglikes [T, P] -> (output labels, total cost, reached_final)."""
        ll = np.ascontiguousarray(loglikes, np.float32)
        T = ll.shape[0]
        if self._lib is not None:
            g = self.graph
            cap = max(16, 4 * T + 16)
            while True:
                out = np.zeros(cap, np.int32)
                cost = ctypes.c_float(0.0)
                n = self._lib.fst_viterbi_decode(
                    g.arc_offsets, g.arc_dst, g.arc_il, g.arc_ol,
                    np.ascontiguousarray(g.arc_w),
                    np.ascontiguousarray(g.final_w),
                    g.num_states, g.start,
                    ll, T, ll.shape[1],
                    self.acoustic_scale, self.beam, self.max_active,
                    out, cap, ctypes.byref(cost),
                )
                if n == np.iinfo(np.int32).min:  # no token at all
                    return [], float(cost.value), False
                reached_final = n >= 0
                count = n if n >= 0 else (-n) - 1
                if count <= cap:
                    return (
                        out[:count].tolist(), float(cost.value), reached_final
                    )
                # epsilon word arcs aren't bounded by T, so the initial cap
                # can truncate eps-heavy graphs — retry with the exact count
                logger.warning(
                    "fst decode output (%d labels) exceeded the %d-label "
                    "buffer; retrying", count, cap,
                )
                cap = count
        return self._decode_numpy(ll)

    # --- pure-NumPy fallback (same algorithm, also the test oracle) ---

    def _decode_numpy(self, ll: np.ndarray) -> Tuple[List[int], float, bool]:
        g = self.graph
        T = ll.shape[0]
        # tokens: dict state -> (cost, back_idx); arena of (back, olabel)
        arena: List[Tuple[int, int]] = [(-1, 0)]
        costs = {g.start: (0.0, 0)}
        costs = self._eps_closure(costs, arena)
        for t in range(T):
            if not costs:
                break
            best = min(c for c, _ in costs.values())
            cutoff = best + self.beam
            if self.max_active > 0 and len(costs) > self.max_active:
                cs = sorted(c for c, _ in costs.values())
                cutoff = min(cutoff, cs[self.max_active - 1])
            nxt: dict = {}
            for s, (c, tok) in costs.items():
                if c > cutoff:
                    continue
                for a in range(g.arc_offsets[s], g.arc_offsets[s + 1]):
                    il = int(g.arc_il[a])
                    if il == 0 or il - 1 >= ll.shape[1]:
                        continue
                    nc = c + float(g.arc_w[a]) - self.acoustic_scale * float(
                        ll[t, il - 1]
                    )
                    d = int(g.arc_dst[a])
                    if d not in nxt or nc < nxt[d][0]:
                        arena.append((tok, int(g.arc_ol[a])))
                        nxt[d] = (nc, len(arena) - 1)
            nxt = self._eps_closure(nxt, arena)
            if nxt:
                costs = nxt
        reached_final = False
        best_cost, best_tok = np.inf, -1
        for s, (c, tok) in costs.items():
            fw = float(g.final_w[s])
            if np.isfinite(fw):
                if not reached_final or c + fw < best_cost:
                    best_cost, best_tok, reached_final = c + fw, tok, True
        if not reached_final:
            for s, (c, tok) in costs.items():
                if c < best_cost:
                    best_cost, best_tok = c, tok
        labels: List[int] = []
        tk = best_tok
        while tk > 0:
            back, ol = arena[tk]
            if ol != 0:
                labels.append(ol)
            tk = back
        return labels[::-1], float(best_cost), reached_final

    # --- lattice decoding (the latgen-faster-mapped contract) ---

    def decode_lattice(
        self,
        loglikes: np.ndarray,
        lattice_beam: float = 8.0,
        min_active: int = 20,
    ):
        """Decode to a pruned lattice (tools.lattice.Lattice, status str).

        Rebuilds the reference's ``latgen-faster-mapped --lattice-beam``
        stage (run_chain_e2e.sh:218-222): the lattice keeps every path
        whose best completion is within ``lattice_beam`` of the best path,
        with graph and acoustic costs stored separately so the scoring
        stage can rescale/rescore exactly. status: 'final' | 'partial'."""
        from espresso_tpu.tools.lattice import Lattice

        ll = np.ascontiguousarray(loglikes, np.float32)
        T = ll.shape[0]
        if self._lib is not None:
            g = self.graph
            status = ctypes.c_int32(0)
            cost = ctypes.c_float(0.0)
            h = self._lib.fst_lattice_decode(
                g.arc_offsets, g.arc_dst, g.arc_il, g.arc_ol,
                np.ascontiguousarray(g.arc_w),
                np.ascontiguousarray(g.final_w),
                g.num_states, g.start,
                ll, T, ll.shape[1],
                self.acoustic_scale, self.beam,
                float(lattice_beam), int(min_active), self.max_active,
                ctypes.byref(status), ctypes.byref(cost),
            )
            try:
                nn = ctypes.c_int32(0)
                na = ctypes.c_int32(0)
                self._lib.lattice_sizes(
                    h, ctypes.byref(nn), ctypes.byref(na)
                )
                N, A = nn.value, na.value
                node_frame = np.zeros(N, np.int32)
                node_final = np.zeros(N, np.float32)
                arc_src = np.zeros(A, np.int32)
                arc_dst = np.zeros(A, np.int32)
                arc_il = np.zeros(A, np.int32)
                arc_ol = np.zeros(A, np.int32)
                arc_g = np.zeros(A, np.float32)
                arc_a = np.zeros(A, np.float32)
                self._lib.lattice_copy(
                    h, node_frame, node_final, arc_src, arc_dst,
                    arc_il, arc_ol, arc_g, arc_a,
                )
            finally:
                self._lib.lattice_free(h)
            lat = Lattice(
                node_frame, node_final, arc_src, arc_dst, arc_il,
                arc_ol, arc_g, arc_a,
            )
            return lat, ("final" if status.value == 1 else "partial")
        return self._decode_lattice_numpy(ll, lattice_beam, min_active)

    def _decode_lattice_numpy(
        self, ll: np.ndarray, lattice_beam: float, min_active: int
    ):
        """Pure-NumPy mirror of clib fst_lattice_decode (same pruning
        semantics, incl. the adaptive next-frame cutoff) — the oracle for
        native/NumPy agreement tests and the no-toolchain fallback."""
        from espresso_tpu.tools.lattice import Lattice

        g = self.graph
        T = ll.shape[0]
        # token arrays: cost, state, frame, links list
        toks: List[dict] = []
        frames: List[List[int]] = [[]]
        tok_of_state: dict = {}

        def new_token(frame, state, cost):
            ti = len(toks)
            toks.append(
                dict(cost=cost, state=state, frame=frame, links=[],
                     eps_expanded=False)
            )
            frames[frame].append(ti)
            tok_of_state[state] = ti
            return ti

        def get_token(frame, state, cost):
            if state not in tok_of_state:
                return new_token(frame, state, cost)
            ti = tok_of_state[state]
            if cost < toks[ti]["cost"]:
                toks[ti]["cost"] = cost
            return ti

        def eps_closure(frame):
            queue = list(frames[frame])
            qi = 0
            while qi < len(queue):
                ti = queue[qi]
                qi += 1
                c = toks[ti]["cost"]
                s = toks[ti]["state"]
                if not toks[ti]["eps_expanded"]:
                    toks[ti]["eps_expanded"] = True
                    for a in range(g.arc_offsets[s], g.arc_offsets[s + 1]):
                        if int(g.arc_il[a]) != 0:
                            continue
                        nc = c + float(g.arc_w[a])
                        before = len(toks)
                        di = get_token(frame, int(g.arc_dst[a]), nc)
                        toks[ti]["links"].append(
                            (di, 0, int(g.arc_ol[a]), float(g.arc_w[a]),
                             0.0)
                        )
                        if len(toks) > before or toks[di]["cost"] == nc:
                            queue.append(di)
                else:
                    for (di, il, _ol, gw, _ac) in toks[ti]["links"]:
                        if il != 0:
                            continue
                        nc = c + gw
                        if nc < toks[di]["cost"]:
                            toks[di]["cost"] = nc
                            queue.append(di)

        new_token(0, g.start, 0.0)
        eps_closure(0)
        for t in range(T):
            costs = np.asarray([toks[ti]["cost"] for ti in frames[t]])
            cutoff = float(costs.min()) + self.beam
            if self.max_active > 0 and len(costs) > self.max_active:
                part = np.partition(costs, self.max_active - 1)
                max_cut = float(part[self.max_active - 1])
                if max_cut < cutoff:
                    cutoff = max_cut
                    if min_active > 0 and len(costs) > min_active:
                        cutoff = max(
                            cutoff,
                            float(
                                np.partition(costs, min_active - 1)[
                                    min_active - 1
                                ]
                            ),
                        )
            frames.append([])
            tok_of_state = {}
            next_cutoff = np.inf
            for ti in frames[t]:
                c = toks[ti]["cost"]
                if c > cutoff:
                    continue
                s = toks[ti]["state"]
                for a in range(g.arc_offsets[s], g.arc_offsets[s + 1]):
                    il = int(g.arc_il[a])
                    if il == 0 or il - 1 >= ll.shape[1]:
                        continue
                    ac = -self.acoustic_scale * float(ll[t, il - 1])
                    nc = c + float(g.arc_w[a]) + ac
                    if nc > next_cutoff:
                        continue
                    if nc + self.beam < next_cutoff:
                        next_cutoff = nc + self.beam
                    di = get_token(t + 1, int(g.arc_dst[a]), nc)
                    toks[ti]["links"].append(
                        (di, il, int(g.arc_ol[a]), float(g.arc_w[a]), ac)
                    )
            if not frames[t + 1]:
                frames.pop()
                break
            eps_closure(t + 1)

        last = len(frames) - 1
        reached_final = any(
            np.isfinite(g.final_w[toks[ti]["state"]]) for ti in frames[last]
        )
        # backward extra-cost pruning
        beta = np.full(len(toks), np.inf)
        for ti in frames[last]:
            beta[ti] = (
                float(g.final_w[toks[ti]["state"]]) if reached_final else 0.0
            )
        for fr in range(last, -1, -1):
            for _ in range(len(frames[fr]) + 1):
                changed = False
                for ti in frames[fr]:
                    b = beta[ti]
                    for (di, _il, _ol, gw, ac) in toks[ti]["links"]:
                        nb = gw + ac + beta[di]
                        if nb < b:
                            b = nb
                    if b < beta[ti]:
                        beta[ti] = b
                        changed = True
                if not changed:
                    break
        best_total = min(
            (toks[ti]["cost"] + beta[ti] for ti in frames[0]),
            default=np.inf,
        )
        margin = lattice_beam + 1e-4
        remap = {}
        node_frame: List[int] = []
        node_final: List[float] = []
        for ft in frames:
            for ti in ft:
                if toks[ti]["cost"] + beta[ti] - best_total <= margin:
                    remap[ti] = len(node_frame)
                    node_frame.append(toks[ti]["frame"])
                    f = np.inf
                    if toks[ti]["frame"] == last:
                        f = (
                            float(g.final_w[toks[ti]["state"]])
                            if reached_final
                            else 0.0
                        )
                    node_final.append(f)
        arcs = []
        for ti, tok in enumerate(toks):
            if ti not in remap:
                continue
            for (di, il, ol, gw, ac) in tok["links"]:
                if di not in remap:
                    continue
                if tok["cost"] + gw + ac + beta[di] > best_total + margin:
                    continue
                arcs.append((remap[ti], remap[di], il, ol, gw, ac))
        lat = Lattice(
            node_frame=np.asarray(node_frame, np.int32),
            node_final=np.asarray(node_final, np.float32),
            arc_src=np.asarray([a[0] for a in arcs], np.int32),
            arc_dst=np.asarray([a[1] for a in arcs], np.int32),
            arc_il=np.asarray([a[2] for a in arcs], np.int32),
            arc_ol=np.asarray([a[3] for a in arcs], np.int32),
            arc_g=np.asarray([a[4] for a in arcs], np.float32),
            arc_a=np.asarray([a[5] for a in arcs], np.float32),
        )
        return lat, ("final" if reached_final else "partial")

    def _eps_closure(self, costs: dict, arena: list) -> dict:
        g = self.graph
        heap = [(c, s) for s, (c, _) in costs.items()]
        heapq.heapify(heap)
        while heap:
            c, s = heapq.heappop(heap)
            if s not in costs or costs[s][0] < c:
                continue
            tok = costs[s][1]
            for a in range(g.arc_offsets[s], g.arc_offsets[s + 1]):
                if int(g.arc_il[a]) != 0:
                    continue
                d = int(g.arc_dst[a])
                nc = c + float(g.arc_w[a])
                if d not in costs or nc < costs[d][0]:
                    arena.append((tok, int(g.arc_ol[a])))
                    costs[d] = (nc, len(arena) - 1)
                    heapq.heappush(heap, (nc, d))
        return costs
