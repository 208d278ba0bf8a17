"""LF-MMI (chain) loss: denominator-graph forward-backward on device.

TPU-native replacement for PyChain (the OpenFst-based C++/CUDA extension the
reference calls at espresso/criterions/lf_mmi_loss.py:75-110): the
denominator HMM is a sparse arc list (from_state, to_state, pdf, log_weight)
over which the forward pass runs as a ``lax.scan`` over time with
segment-logsumexp per step — every arc is processed in parallel on the VPU,
O(T) sequential depth. The numerator is the frame-level alignment path
(E2E numerator FSTs can be lowered to the same arc format offline).

Loss: -(num_score - den_logZ); gradient wrt log-probs is the occupancy
difference (numerator one-hot minus denominator posterior), provided
analytically via ``jax.custom_vjp`` so the scan is never differentiated
through.

Graph file format (.npz): from_state, to_state, pdf, weight [A] arrays +
final_weights [S]; start state is 0. A converter from Kaldi/OpenFst text
format is ``DenominatorGraph.from_fst_text``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


@dataclass
class DenominatorGraph:
    from_state: np.ndarray  # [A]
    to_state: np.ndarray  # [A]
    pdf: np.ndarray  # [A] pdf-id emitted on the arc
    weight: np.ndarray  # [A] log transition weight
    final_weights: np.ndarray  # [S] log final weights (NEG_INF = non-final)
    num_states: int

    @staticmethod
    def load(path: str) -> "DenominatorGraph":
        base, _, off = path.rpartition(":")
        if path.endswith(".fst") or (base and off.isdigit()):
            return DenominatorGraph.from_fst_binary(path)
        if path.endswith(".txt"):
            with open(path) as f:
                return DenominatorGraph.from_fst_text(f.read())
        z = np.load(path)
        return DenominatorGraph(
            from_state=z["from_state"].astype(np.int32),
            to_state=z["to_state"].astype(np.int32),
            pdf=z["pdf"].astype(np.int32),
            weight=z["weight"].astype(np.float32),
            final_weights=z["final_weights"].astype(np.float32),
            num_states=len(z["final_weights"]),
        )

    def save(self, path: str) -> None:
        np.savez(
            path,
            from_state=self.from_state,
            to_state=self.to_state,
            pdf=self.pdf,
            weight=self.weight,
            final_weights=self.final_weights,
        )

    def leaky_probs(self, mode: str = "stationary", iters: int = 20) -> np.ndarray:
        """Per-state leak destination distribution for the leaky-HMM
        (reference: pychain ChainGraph(initial_mode="leaky") /
        kaldi chain-denominator InitialProbs).

        * ``uniform`` — 1/S everywhere.
        * ``transition`` — proportional to total incoming arc probability
          from a uniform source (one propagation step).
        * ``stationary`` — power-iterate the (row-normalized) transition
          matrix from uniform: the HMM's stationary state distribution
          (kaldi's choice, chain-denominator.cc InitialProbs).
        """
        S = self.num_states
        if mode == "uniform":
            return np.full(S, 1.0 / S, np.float32)
        # row-normalized transition probabilities
        p_arc = np.exp(self.weight.astype(np.float64))
        out_sum = np.zeros(S, np.float64)
        np.add.at(out_sum, self.from_state, p_arc)
        p_norm = p_arc / np.maximum(out_sum[self.from_state], 1e-30)
        pi = np.full(S, 1.0 / S, np.float64)
        n_steps = 1 if mode == "transition" else iters
        for _ in range(n_steps):
            nxt = np.zeros(S, np.float64)
            np.add.at(nxt, self.to_state, pi[self.from_state] * p_norm)
            total = nxt.sum()
            if total <= 0:
                break
            pi = nxt / total
        return pi.astype(np.float32)

    @staticmethod
    def from_fst_binary(path: str) -> "DenominatorGraph":
        """Read an OpenFst binary ``StdVectorFst`` (the on-disk format of
        kaldi's den.fst; what pychain's simplefst.StdVectorFst.read loads —
        reference lf_mmi_loss.py:148-154). Handles an optional Kaldi
        ``\\0B`` binary-stream marker and ``path:offset`` rxfilenames (for
        per-utterance numerator FSTs stored in an archive, reference
        espresso/data/asr_chain_dataset.py read_fsts :102). Arc ilabels are
        pdf-id + 1; weights are tropical -log probs (negated on load,
        matching from_fst_text)."""
        import struct

        seek = 0
        if ":" in path:
            base, _, off_s = path.rpartition(":")
            if off_s.isdigit():
                path, seek = base, int(off_s)
        with open(path, "rb") as f:
            f.seek(seek)
            data = f.read()
        off = 0
        if data[:2] == b"\x00B":  # kaldi binary marker
            off = 2

        def u32():
            nonlocal off
            (v,) = struct.unpack_from("<i", data, off)
            off += 4
            return v

        def u64():
            nonlocal off
            (v,) = struct.unpack_from("<q", data, off)
            off += 8
            return v

        def f32():
            nonlocal off
            (v,) = struct.unpack_from("<f", data, off)
            off += 4
            return v

        def string():
            nonlocal off
            n = u32()
            s = data[off : off + n].decode()
            off += n
            return s

        magic = u32()
        if magic != 2125659606:
            raise ValueError(f"not an OpenFst binary file (magic {magic})")
        fsttype = string()
        arctype = string()
        if arctype != "standard":
            raise ValueError(f"unsupported arc type {arctype!r}")
        if fsttype != "vector":
            raise ValueError(
                f"unsupported fst type {fsttype!r} (convert to StdVectorFst,"
                " e.g. `fstconvert --fst_type=vector`)"
            )
        version = u32()
        _flags = u32()
        _properties = u64()
        start = u64()
        num_states = u64()
        _num_arcs = u64()
        if num_states < 0:
            raise ValueError("streaming-header fst not supported")
        froms, tos, pdfs, weights = [], [], [], []
        final_weights = np.full(num_states, NEG_INF, np.float32)
        narcs_fmt = "<q" if version >= 2 else "<i"
        narcs_size = 8 if version >= 2 else 4
        for s in range(num_states):
            fw = f32()
            (narcs,) = struct.unpack_from(narcs_fmt, data, off)
            off += narcs_size
            if fw < np.float32(np.inf):
                final_weights[s] = -fw
            arr = np.frombuffer(
                data,
                dtype=np.dtype(
                    [
                        ("ilabel", "<i4"),
                        ("olabel", "<i4"),
                        ("weight", "<f4"),
                        ("nextstate", "<i4"),
                    ]
                ),
                count=narcs,
                offset=off,
            )
            off += 16 * narcs
            if narcs and (arr["ilabel"] == 0).any():
                raise ValueError(
                    "epsilon arcs in denominator fst (run fstrmepsilon first)"
                )
            froms.append(np.full(narcs, s, np.int32))
            tos.append(arr["nextstate"].astype(np.int32))
            pdfs.append(arr["ilabel"].astype(np.int32) - 1)
            weights.append(-arr["weight"].astype(np.float32))
        from_state = np.concatenate(froms) if froms else np.zeros(0, np.int32)
        to_state = np.concatenate(tos) if tos else np.zeros(0, np.int32)
        pdf = np.concatenate(pdfs) if pdfs else np.zeros(0, np.int32)
        weight = np.concatenate(weights) if weights else np.zeros(0, np.float32)
        if start not in (0, -1):
            # our forward starts at state 0: swap `start` and 0 everywhere
            sw = {0: int(start), int(start): 0}
            remap = lambda a: np.asarray(
                [sw.get(int(x), int(x)) for x in a], a.dtype
            )
            from_state = remap(from_state)
            to_state = remap(to_state)
            fw0 = final_weights[0]
            final_weights[0] = final_weights[start]
            final_weights[start] = fw0
        return DenominatorGraph(
            from_state=from_state,
            to_state=to_state,
            pdf=pdf,
            weight=weight,
            final_weights=final_weights,
            num_states=int(num_states),
        )

    def to_fst_binary(self) -> bytes:
        """Serialize as an OpenFst binary ``StdVectorFst`` (inverse of
        ``from_fst_binary``; used to write per-utterance numerator-FST
        archives). Weights are negated back to tropical -log probs."""
        import struct

        out = [struct.pack("<i", 2125659606)]

        def put_string(s: str):
            out.append(struct.pack("<i", len(s)))
            out.append(s.encode())

        put_string("vector")
        put_string("standard")
        out.append(struct.pack("<i", 2))  # version
        out.append(struct.pack("<i", 0))  # flags
        out.append(struct.pack("<q", 0))  # properties
        out.append(struct.pack("<q", 0))  # start state
        out.append(struct.pack("<q", self.num_states))
        out.append(struct.pack("<q", len(self.from_state)))
        order = np.argsort(self.from_state, kind="stable")
        by_state: dict = {}
        for i in order:
            by_state.setdefault(int(self.from_state[i]), []).append(int(i))
        for s in range(self.num_states):
            fw = self.final_weights[s]
            out.append(
                struct.pack("<f", np.float32(np.inf) if fw <= NEG_INF / 2 else -fw)
            )
            arcs = by_state.get(s, [])
            out.append(struct.pack("<q", len(arcs)))
            for i in arcs:
                out.append(
                    struct.pack(
                        "<iifi",
                        int(self.pdf[i]) + 1,
                        int(self.pdf[i]) + 1,
                        -float(self.weight[i]),
                        int(self.to_state[i]),
                    )
                )
        return b"".join(out)

    @staticmethod
    def from_fst_text(text: str, num_pdfs: Optional[int] = None) -> "DenominatorGraph":
        """Parse OpenFst text format: lines ``from to ilabel[ olabel[ weight]]``
        (acceptor; ilabel = pdf-id + 1, 0 = eps not supported) and final lines
        ``state [weight]``. Weights are -log (tropical) in Kaldi convention ->
        stored as log-probs (negated)."""
        arcs = []
        finals = {}
        max_state = 0
        for line in text.strip().splitlines():
            parts = line.split()
            if len(parts) >= 3 and all(
                p.replace(".", "").replace("-", "").isdigit() for p in parts[:3]
            ):
                if len(parts) in (4, 5):
                    frm, to, ilabel = int(parts[0]), int(parts[1]), int(parts[2])
                    w = -float(parts[4]) if len(parts) == 5 else 0.0
                    arcs.append((frm, to, ilabel - 1, w))
                    max_state = max(max_state, frm, to)
                    continue
                if len(parts) == 3:
                    frm, to, ilabel = int(parts[0]), int(parts[1]), int(parts[2])
                    arcs.append((frm, to, ilabel - 1, 0.0))
                    max_state = max(max_state, frm, to)
                    continue
            if len(parts) in (1, 2):
                state = int(parts[0])
                w = -float(parts[1]) if len(parts) == 2 else 0.0
                finals[state] = w
                max_state = max(max_state, state)
        S = max_state + 1
        final_weights = np.full(S, NEG_INF, np.float32)
        for s, w in finals.items():
            final_weights[s] = w
        arr = np.asarray(arcs, dtype=np.float64)
        return DenominatorGraph(
            from_state=arr[:, 0].astype(np.int32),
            to_state=arr[:, 1].astype(np.int32),
            pdf=arr[:, 2].astype(np.int32),
            weight=arr[:, 3].astype(np.float32),
            final_weights=final_weights,
            num_states=S,
        )


def _segment_logsumexp(values: jnp.ndarray, segments: jnp.ndarray, num: int):
    """Logsumexp of ``values`` grouped by ``segments`` along the last axis.
    values: [B, A]; segments: [A] -> [B, num]."""
    m = jax.ops.segment_max(
        values.T, segments, num_segments=num, indices_are_sorted=False
    ).T  # [B, num]
    m_safe = jnp.maximum(m, NEG_INF)
    gathered = m_safe[:, segments]  # [B, A]
    s = jax.ops.segment_sum(
        jnp.exp(values - gathered).T, segments, num_segments=num
    ).T
    return jnp.where(m > NEG_INF / 2, m_safe + jnp.log(jnp.maximum(s, 1e-30)), NEG_INF)


def _den_forward(lp, lengths, from_s, to_s, pdf, weight, finals, S, log_leak):
    """alpha scan; returns (logZ [B], alpha_dash [T+1, B, S]).

    With ``log_leak`` (= log(leaky_coeff) + log(pi), [S]) the leaky-HMM
    transition (kaldi chain-denominator.cc AlphaDash) is applied before each
    frame's arcs: alpha'(t,s) = alpha(t,s) ⊕ (Σ_s' alpha(t,s')) · leak(s).
    The stored per-frame values are the leak-adjusted alpha' used by the
    occupancy computation."""
    B, T, V = lp.shape
    alpha0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)

    def leak(alpha):
        if log_leak is None:
            return alpha
        tot = jax.nn.logsumexp(alpha, axis=-1, keepdims=True)  # [B, 1]
        return jnp.logaddexp(alpha, tot + log_leak[None, :])

    def step(alpha, inputs):
        t, lp_t = inputs
        alpha_dash = leak(alpha)
        arc_scores = (
            alpha_dash[:, from_s] + weight[None, :] + lp_t[:, pdf]
        )  # [B, A]
        new_alpha = _segment_logsumexp(arc_scores, to_s, S)
        active = (t < lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, jnp.where(active, alpha_dash, alpha)

    lp_tfirst = jnp.moveaxis(lp, 1, 0)
    alpha_T, alphas = jax.lax.scan(step, alpha0, (jnp.arange(T), lp_tfirst))
    logZ = jax.nn.logsumexp(alpha_T + finals[None, :], axis=-1)
    alphas = jnp.concatenate([alphas, alpha_T[None]], axis=0)  # [T+1, B, S]
    return logZ, alphas


def _den_backward(lp, lengths, from_s, to_s, pdf, weight, finals, S, log_leak):
    """beta scan (reverse); returns beta_dash [T, B, S] where beta_dash[t] is
    the completion score from a state at time t, including the time-t leak
    (kaldi BetaDash: beta'(t,s) = beta(t,s) ⊕ Σ_s' leak(s')·beta(t,s'))."""
    B, T, V = lp.shape

    def leak(beta):
        if log_leak is None:
            return beta
        tot = jax.nn.logsumexp(beta + log_leak[None, :], axis=-1, keepdims=True)
        return jnp.logaddexp(beta, tot)

    def step(beta_next, inputs):
        t, lp_t = inputs
        arc_scores = beta_next[:, to_s] + weight[None, :] + lp_t[:, pdf]
        beta_t = leak(_segment_logsumexp(arc_scores, from_s, S))
        # at t == length: beta = final weights
        at_end = (t == lengths)[:, None]
        beta_t = jnp.where(at_end, finals[None, :], beta_t)
        inactive = (t > lengths)[:, None]
        beta_t = jnp.where(inactive, beta_next, beta_t)
        return beta_t, beta_t

    lp_tfirst = jnp.moveaxis(lp, 1, 0)
    init = jnp.broadcast_to(finals[None, :], (B, S))
    ts = jnp.arange(T - 1, -1, -1)
    _, betas_rev = jax.lax.scan(
        step, init, (ts, jnp.flip(lp_tfirst, 0))
    )
    betas = jnp.flip(betas_rev, axis=0)  # [T, B, S]; betas[t] pairs alpha[t]
    return betas


@jax.custom_vjp
def den_logz(lp, lengths, graph_arrays):
    """Denominator log-partition per example. lp: [B, T, V] log-probs;
    graph_arrays: tuple of device arrays
    (from, to, pdf, weight, finals, log_leak-or-None). The gradient (the
    denominator occupancy, computed by the alpha/beta forward-backward) is
    provided analytically via custom_vjp so the scan is never differentiated
    through (reference: pychain ChainFunction backward)."""
    from_s, to_s, pdf, weight, finals, log_leak = graph_arrays
    S = finals.shape[0]
    logZ, _ = _den_forward(
        lp, lengths, from_s, to_s, pdf, weight, finals, S, log_leak
    )
    return logZ


def _den_fwd(lp, lengths, graph_arrays):
    return den_logz(lp, lengths, graph_arrays), (lp, lengths, graph_arrays)


def _den_bwd(res, g):
    lp, lengths, graph_arrays = res
    from_s, to_s, pdf, weight, finals, log_leak = graph_arrays
    S = finals.shape[0]
    B, T, V = lp.shape
    logZ, alphas = _den_forward(
        lp, lengths, from_s, to_s, pdf, weight, finals, S, log_leak
    )
    betas = _den_backward(
        lp, lengths, from_s, to_s, pdf, weight, finals, S, log_leak
    )

    # denominator occupancy per (t, pdf): sum over arcs of
    # exp(alpha[t, from] + w + lp[t, pdf] + beta[t+1->](to) - logZ)
    def occ_step(carry, inputs):
        alpha_t, beta_t1, lp_t, t = inputs
        arc = (
            alpha_t[:, from_s]
            + weight[None, :]
            + lp_t[:, pdf]
            + beta_t1[:, to_s]
            - logZ[:, None]
        )
        occ = jax.ops.segment_sum(jnp.exp(arc).T, pdf, num_segments=V).T  # [B, V]
        active = (t < lengths)[:, None]
        return carry, jnp.where(active, occ, 0.0)

    lp_tfirst = jnp.moveaxis(lp, 1, 0)
    # betas[t] is completion from time t AFTER consuming arc at t -> we need
    # beta at t+1 paired with alpha at t: betas computed so betas[t] uses
    # lp[t]; completion-from-(t+1) = betas[t+1] with betas[T] := finals
    beta_next = jnp.concatenate(
        [
            betas[1:],
            jnp.broadcast_to(finals[None, None, :], (1, B, S)),
        ],
        axis=0,
    )
    _, occs = jax.lax.scan(
        occ_step,
        None,
        (alphas[:-1], beta_next, lp_tfirst, jnp.arange(T)),
    )
    den_occ = jnp.moveaxis(occs, 0, 1)  # [B, T, V]
    grad_lp = den_occ * g[:, None, None]
    return grad_lp, None, None


den_logz.defvjp(_den_fwd, _den_bwd)


def chain_loss_from_log_probs(lp, targets, lengths, graph_arrays):
    """Per-example -(num - den). lp: [B, T, V] log-probs; targets: [B, T]
    alignment pdf-ids (-1 pad); graph_arrays as for ``den_logz``. The
    alignment numerator is a plain gather (autodiff gives the one-hot
    occupancy); the denominator uses the analytic custom_vjp."""
    B, T, V = lp.shape
    t_idx = jnp.arange(T)[None, :]
    valid = (t_idx < lengths[:, None]) & (targets >= 0)
    safe_t = jnp.maximum(targets, 0)
    num = jnp.where(
        valid, jnp.take_along_axis(lp, safe_t[..., None], axis=-1)[..., 0], 0.0
    ).sum(axis=1)
    return -(num - den_logz(lp, lengths, graph_arrays))


# ---------------------------------------------------------------------------
# Per-utterance numerator FSTs (full PyChain parity: reference
# espresso/data/asr_chain_dataset.py NumeratorGraphDataset :92 +
# pychain numerator forward-backward). Each utterance has its own small
# acceptor over pdf-ids; the batch packs them into padded arc arrays and the
# forward runs as ONE scan over time with a flat batched segment-logsumexp —
# every arc of every graph in the batch is processed in parallel on the VPU.
# ---------------------------------------------------------------------------


def _flat_segment_logsumexp(values: jnp.ndarray, segments: jnp.ndarray, num: int):
    """1-D segmented logsumexp: values [N] grouped by segments [N] -> [num]."""
    m = jax.ops.segment_max(values, segments, num_segments=num)
    m_safe = jnp.maximum(m, NEG_INF)
    s = jax.ops.segment_sum(
        jnp.exp(values - m_safe[segments]), segments, num_segments=num
    )
    return jnp.where(m > NEG_INF / 2, m_safe + jnp.log(jnp.maximum(s, 1e-30)), NEG_INF)


def pack_numerator_graphs(
    graphs: Sequence["DenominatorGraph"],
    max_arcs: Optional[int] = None,
    max_states: Optional[int] = None,
) -> dict:
    """Pack per-utterance numerator FSTs into padded batch arrays (keys are
    the batch-dict fields consumed by the LF-MMI criterion). Padding arcs
    carry NEG_INF weight so they contribute nothing to the logsumexp;
    padding states are non-final. Start state of every graph must be 0
    (``from_fst_binary`` remaps on load)."""
    A = max_arcs or max(len(g.from_state) for g in graphs)
    S = max_states or max(g.num_states for g in graphs)
    B = len(graphs)
    out = {
        "num_from": np.zeros((B, A), np.int32),
        "num_to": np.zeros((B, A), np.int32),
        "num_pdf": np.zeros((B, A), np.int32),
        "num_weight": np.full((B, A), NEG_INF, np.float32),
        "num_final": np.full((B, S), NEG_INF, np.float32),
    }
    for b, g in enumerate(graphs):
        a, s = len(g.from_state), g.num_states
        if a > A or s > S:
            raise ValueError(
                f"numerator graph {b} exceeds pack capacity ({a}>{A} or {s}>{S})"
            )
        out["num_from"][b, :a] = g.from_state
        out["num_to"][b, :a] = g.to_state
        out["num_pdf"][b, :a] = g.pdf
        out["num_weight"][b, :a] = g.weight
        out["num_final"][b, :s] = g.final_weights
    return out


def numerator_scores(
    lp: jnp.ndarray,
    lengths: jnp.ndarray,
    num_from: jnp.ndarray,
    num_to: jnp.ndarray,
    num_pdf: jnp.ndarray,
    num_weight: jnp.ndarray,
    num_final: jnp.ndarray,
) -> jnp.ndarray:
    """Batched numerator forward score: [B] log-prob of each utterance's
    numerator FST against lp [B, T, V]. Differentiable by autodiff (the
    numerator graphs are tiny, so storing the scan residuals is cheap; the
    gradient is exactly the numerator occupancy)."""
    B, T, V = lp.shape
    A = num_from.shape[1]
    S = num_final.shape[1]
    offs = (jnp.arange(B) * S)[:, None]  # [B, 1]
    flat_to = (num_to + offs).reshape(-1)  # [B*A]
    alpha0 = jnp.full((B, S), NEG_INF).at[:, 0].set(0.0)

    def step(alpha, inputs):
        t, lp_t = inputs  # lp_t [B, V]
        arc_scores = (
            jnp.take_along_axis(alpha, num_from, axis=1)
            + num_weight
            + jnp.take_along_axis(lp_t, num_pdf, axis=1)
        )  # [B, A]
        new_alpha = _flat_segment_logsumexp(
            arc_scores.reshape(-1), flat_to, B * S
        ).reshape(B, S)
        active = (t < lengths)[:, None]
        return jnp.where(active, new_alpha, alpha), None

    lp_tfirst = jnp.moveaxis(lp, 1, 0)
    alpha_T, _ = jax.lax.scan(step, alpha0, (jnp.arange(T), lp_tfirst))
    return jax.nn.logsumexp(alpha_T + num_final, axis=-1)


def chain_loss_fst_from_log_probs(lp, lengths, num_arrays, graph_arrays):
    """Per-example -(num - den) with per-utterance numerator FSTs.
    num_arrays: (num_from, num_to, num_pdf, num_weight, num_final)."""
    num = numerator_scores(lp, lengths, *num_arrays)
    return -(num - den_logz(lp, lengths, graph_arrays))


def chain_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    lengths: jnp.ndarray,
    graph: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.0,
    leaky_mode: str = "stationary",
) -> jnp.ndarray:
    """LF-MMI per-example loss from logits [B, T, V].

    ``leaky_hmm_coefficient`` > 0 enables the leaky-HMM denominator
    (reference lf_mmi_loss.py:28-31 default 1e-5; kaldi chain-denominator):
    every state leaks to every other state with probability
    coeff · pi(dest), which smooths the denominator and avoids numerical
    die-off on long utterances."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    graph_arrays = _graph_arrays(graph, leaky_hmm_coefficient, leaky_mode)
    return chain_loss_from_log_probs(lp, targets, lengths, graph_arrays)


def _graph_arrays(graph, leaky_hmm_coefficient, leaky_mode):
    if leaky_hmm_coefficient > 0.0:
        pi = graph.leaky_probs(leaky_mode)
        log_leak = jnp.asarray(
            np.log(leaky_hmm_coefficient) + np.log(np.maximum(pi, 1e-30))
        )
    else:
        log_leak = None
    return (
        jnp.asarray(graph.from_state),
        jnp.asarray(graph.to_state),
        jnp.asarray(graph.pdf),
        jnp.asarray(graph.weight),
        jnp.asarray(graph.final_weights),
        log_leak,
    )


def chain_loss_fst(
    logits: jnp.ndarray,
    lengths: jnp.ndarray,
    num_arrays: Tuple[jnp.ndarray, ...],
    graph: DenominatorGraph,
    leaky_hmm_coefficient: float = 0.0,
    leaky_mode: str = "stationary",
) -> jnp.ndarray:
    """LF-MMI per-example loss with per-utterance numerator FSTs (full
    PyChain parity — reference lf_mmi_loss.py computes the numerator score
    by forward-backward over each utterance's numerator graph, not a fixed
    alignment). num_arrays = (num_from, num_to, num_pdf, num_weight,
    num_final) from ``pack_numerator_graphs``."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    graph_arrays = _graph_arrays(graph, leaky_hmm_coefficient, leaky_mode)
    return chain_loss_fst_from_log_probs(lp, lengths, num_arrays, graph_arrays)
