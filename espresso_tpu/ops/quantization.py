"""Weight quantization: scalar int8 (per-channel) and iterative product
quantization (iPQ), plus a Pallas int8 matmul kernel.

Rebuild of fairseq/modules/quantization/ (scalar/ = int8 fake-quant with
per-tensor scales; pq/ = iPQ codebook compression, "Training with
quantization noise for extreme model compression"). TPU re-design:

  * Scalar path stores weights as int8 with fp32 per-output-channel scales.
    On TPU the MXU multiplies int8 natively at 2x bf16 peak; the Pallas
    kernel quantizes activation tiles on the fly (dynamic per-row scale)
    and runs an int8xint8->int32 matmul, dequantizing in the epilogue —
    the w8a8 pattern from the TPU kernel guide.
  * PQ runs k-means on host NumPy over weight sub-vectors (compression is
    offline); the decoded table is a gather, so PQ checkpoints decode on
    load with no model changes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from espresso_tpu.ops.backend import backend_is_tpu
import numpy as np

# ---------------------------------------------------------------------------
# scalar int8
# ---------------------------------------------------------------------------


def quantize_int8(w: np.ndarray, axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8 quantization along ``axis`` (the output
    channel of a Dense kernel). Returns (int8 values, fp32 scales)."""
    w = np.asarray(w, np.float32)
    axis = axis % w.ndim
    amax = np.max(np.abs(w), axis=tuple(i for i in range(w.ndim) if i != axis))
    scale = np.maximum(amax, 1e-8) / 127.0
    shape = [1] * w.ndim
    shape[axis % w.ndim] = -1
    q = np.clip(np.round(w / scale.reshape(shape)), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize_int8(q: np.ndarray, scale: np.ndarray, axis: int = -1) -> np.ndarray:
    shape = [1] * q.ndim
    shape[axis % q.ndim] = -1
    return q.astype(np.float32) * scale.reshape(shape)


def quantize_params_int8(
    params: Dict[str, Any], min_size: int = 4096
) -> Tuple[Dict[str, Any], int, int]:
    """Quantize every 2-D ``kernel`` leaf with >= min_size elements.
    Returns (quantized tree with {"q": int8, "scale": fp32} leaves,
    n_quantized, n_total_leaves). Inverse: :func:`dequantize_params_int8`."""
    n_q = 0
    n_total = 0

    def walk(node):
        nonlocal n_q, n_total
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= min_size
                ):
                    q, s = quantize_int8(np.asarray(v), axis=-1)
                    out[k] = {"__int8__": True, "q": q, "scale": s}
                    n_q += 1
                    n_total += 1
                else:
                    out[k] = walk(v)
            return out
        n_total += 1
        return node

    return walk(params), n_q, n_total


def dequantize_params_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    def walk(node):
        if isinstance(node, dict):
            if node.get("__int8__"):
                return jnp.asarray(dequantize_int8(node["q"], node["scale"]))
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def apply_quant_noise(
    params: Dict[str, Any],
    rng,
    p: float,
    block_size: int = 8,
    min_size: int = 4096,
) -> Dict[str, Any]:
    """Quant-noise training transform (fairseq/modules/quant_noise.py,
    "Training with quantization noise for extreme model compression"):
    during the forward pass a random fraction ``p`` of ``block_size``-wide
    weight blocks is dropped (zeroed, with 1/(1-p) rescale) so the trained
    model tolerates PQ/scalar quantization. Pure functional: returns a new
    params tree; applied inside the jitted train step."""
    import jax as _jax

    if p <= 0.0:
        return params
    leaves_rng = [0]

    def walk(node, key):
        if isinstance(node, dict):
            return {
                k: walk(v, _jax.random.fold_in(key, i))
                for i, (k, v) in enumerate(sorted(node.items()))
            }
        if (
            hasattr(node, "ndim")
            and node.ndim == 2
            and node.size >= min_size
        ):
            n_blocks = -(-node.shape[0] * node.shape[1] // block_size)
            keep = _jax.random.bernoulli(key, 1.0 - p, (n_blocks,))
            mask_flat = jnp.repeat(keep, block_size)[: node.size]
            mask = mask_flat.reshape(node.shape)
            return jnp.where(mask, node / (1.0 - p), 0.0).astype(node.dtype)
        return node

    return walk(params, rng)


# ---------------------------------------------------------------------------
# Pallas w8a8 matmul
# ---------------------------------------------------------------------------


def int8_matmul(
    x: jnp.ndarray,  # [M, K] float
    w_q: jnp.ndarray,  # [K, N] int8
    w_scale: jnp.ndarray,  # [N] fp32 per-output-channel
    block_m: int = 256,
    block_n: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """w8a8 matmul: per-row dynamic activation quantization, int8 MXU
    accumulation in int32, fused dequant epilogue (TPU guide's quantization
    kernel pattern). Falls back to a dense jnp path off-TPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K = x.shape
    Kw, N = w_q.shape
    assert K == Kw

    if (
        not interpret
        and (not backend_is_tpu() or M % 8 != 0 or K % 128 != 0 or N % 128 != 0)
    ):
        return (
            jnp.dot(
                x.astype(jnp.float32),
                w_q.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            * w_scale[None, :]
        )

    bm = min(block_m, M)
    bn = min(block_n, N)

    def kernel(x_ref, wq_ref, ws_ref, out_ref):
        xt = x_ref[:].astype(jnp.float32)  # [bm, K]
        amax = jnp.max(jnp.abs(xt), axis=1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xt / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq,
            wq_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] = acc.astype(jnp.float32) * xs * ws_ref[:]

    grid = (pl.cdiv(M, bm), pl.cdiv(N, bn))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, -1))


# ---------------------------------------------------------------------------
# product quantization (iPQ)
# ---------------------------------------------------------------------------


def pq_quantize(
    w: np.ndarray, block_size: int = 8, n_centroids: int = 256, iters: int = 15,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """k-means codebook over [block_size] sub-vectors of a 2-D weight.
    Returns (centroids [n_centroids, block_size], codes uint8/uint16 flat).
    Compression: 32 bits/weight -> log2(n_centroids)/block_size bits."""
    w = np.asarray(w, np.float32)
    flat = w.reshape(-1)
    pad = (-flat.size) % block_size
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    vecs = flat.reshape(-1, block_size)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(vecs))
    centroids = vecs[rng.choice(len(vecs), size=k, replace=False)].copy()
    for _ in range(iters):
        # assign (chunked to bound memory)
        codes = np.empty(len(vecs), np.int64)
        for s in range(0, len(vecs), 65536):
            chunk = vecs[s : s + 65536]
            d = ((chunk[:, None, :] - centroids[None]) ** 2).sum(-1)
            codes[s : s + len(chunk)] = d.argmin(1)
        # update
        for c in range(k):
            sel = codes == c
            if sel.any():
                centroids[c] = vecs[sel].mean(0)
    dtype = np.uint8 if k <= 256 else np.uint16
    return centroids, codes.astype(dtype)


def pq_dequantize(
    centroids: np.ndarray, codes: np.ndarray, shape: Tuple[int, ...]
) -> np.ndarray:
    flat = centroids[codes.astype(np.int64)].reshape(-1)
    return flat[: int(np.prod(shape))].reshape(shape).astype(np.float32)


def pq_quantize_params(
    params: Dict[str, Any],
    block_size: int = 8,
    n_centroids: int = 256,
    min_size: int = 4096,
) -> Dict[str, Any]:
    """PQ-compress every large kernel leaf; inverse pq_dequantize_params."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and hasattr(v, "ndim")
                    and np.asarray(v).size >= min_size
                ):
                    cent, codes = pq_quantize(
                        np.asarray(v), block_size, n_centroids
                    )
                    out[k] = {
                        "__pq__": True,
                        "centroids": cent,
                        "codes": codes,
                        "shape": np.asarray(np.asarray(v).shape, np.int64),
                    }
                else:
                    out[k] = walk(v)
            return out
        return node

    return walk(params)


def pq_dequantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    def walk(node):
        if isinstance(node, dict):
            if node.get("__pq__"):
                return jnp.asarray(
                    pq_dequantize(
                        node["centroids"],
                        node["codes"],
                        tuple(int(s) for s in node["shape"]),
                    )
                )
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
