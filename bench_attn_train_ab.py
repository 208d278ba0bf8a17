"""On-chip value+gradient parity check for the TRAIN-path fused rel-pos
attention kernel (ops/attention_kernels.rel_attention_train).

The perf side of the A/B is ``bench_train.py`` run twice
(ESPRESSO_FUSED_ATTN_TRAIN=off vs =auto); this script is the numerics
side, the ``bench_rnnt.py`` pattern: the SAME flagship train loss+grads
computed on the chip through the fused kernels and through the jnp path,
compared elementwise. Dropout is 0 here — the fused kernel draws its
in-kernel hash dropout from a different stream than flax RNG, so the two
paths are only comparable with dropout off (modules/attention.py note);
the dropout math itself is oracle-pinned in tests/test_attention_kernel.py.

Prints one JSON line {"metric": "train_attn_parity", ...} with the max
relative loss/grad deltas and rc!=0 on failure.

Reference train point: examples/asr_librispeech/config/
conformer_transducer_librispeech.yaml:28-92 (via bench_train.py shapes).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from espresso_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from bench_train import build_train_point

    # the SAME flagship operating point bench_train.py measures, with
    # dropout 0 (the two attention paths draw different dropout streams —
    # module docstring)
    model, batch, cfg, criterion = build_train_point(dropout=0.0)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["src_frames"],
        batch["src_lengths"],
        batch["prev_output_tokens"],
    )
    # bf16 compute on both paths (the train step's dtype): the fused
    # kernel's contract is bf16 dots + f32 softmax, so the jnp reference
    # must run at the same precision for the comparison to mean anything
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        variables,
    )
    batch["src_frames"] = batch["src_frames"].astype(jnp.bfloat16)

    def loss_fn(params):
        vs = dict(variables)
        vs["params"] = params
        loss, n, logging, _ = criterion(
            model, vs, batch, rngs={"dropout": jax.random.PRNGKey(7)},
            train=True,
        )
        return loss / jnp.maximum(n, 1)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def run(mode):
        os.environ["ESPRESSO_FUSED_ATTN_TRAIN"] = mode
        jax.clear_caches()
        loss, grads = grad_fn(variables["params"])
        flat = jax.tree_util.tree_leaves_with_path(grads)
        return float(np.asarray(loss)), {
            jax.tree_util.keystr(k): np.asarray(v, np.float32)
            for k, v in flat
        }

    loss_ref, g_ref = run("off")
    loss_fused, g_fused = run("auto")

    dl = abs(loss_fused - loss_ref) / max(abs(loss_ref), 1e-9)
    # per-tensor relative error with the denominator floored at a fraction
    # of the GLOBAL gradient scale: tensors whose true gradient is ~0
    # (e.g. a conv bias directly followed by batch norm — its gradient is
    # exactly 0 up to rounding) would otherwise divide rounding noise by
    # rounding noise
    global_scale = max(
        (float(np.abs(b).max()) for b in g_ref.values()), default=1.0
    )
    worst, worst_name, rows = 0.0, "", []
    for k in g_ref:
        a, b = g_fused[k], g_ref[k]
        scale = max(float(np.abs(b).max()), 1e-3 * global_scale)
        rel = float(np.abs(a - b).max()) / scale
        rows.append((rel, k, float(np.abs(b).max())))
        if rel > worst:
            worst, worst_name = rel, k
    for rel, k, bmax in sorted(rows, reverse=True)[:5]:
        print(
            f"  grad delta {rel:.3e} at {k} (ref max {bmax:.3e})",
            file=sys.stderr,
        )
    # bf16 kernels vs bf16 XLA path: per-layer rounding compounds through
    # 16 layers; require agreement at bf16-accumulation scale
    ok = dl < 2e-2 and worst < 8e-2
    print(
        json.dumps(
            {
                "metric": "train_attn_parity",
                "loss_ref": round(loss_ref, 6),
                "loss_fused": round(loss_fused, 6),
                "loss_rel_delta": float(f"{dl:.3e}"),
                "max_grad_rel_delta": float(f"{worst:.3e}"),
                "worst_grad": worst_name,
                "ok": ok,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
