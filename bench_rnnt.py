"""Real-TPU A/B + parity: Pallas RNNT loss kernels vs XLA chunked path.

Flagship shapes (the bench_train operating point): B=16, T=256 encoder
frames, U=100, J=512, V=1024. Checks value + all-four-grad parity between
`rnnt_loss_fused_pallas` (ops/rnnt_pallas.py) and `rnnt_loss_fused_xla`
(ops/rnnt_fused.py) on the real chip — NOT interpret mode — then times
fwd+bwd for both paths with host-fetch-closed clocks.

This is the validation the Pallas-by-default decision rests on
(rnnt_fused.PALLAS_MODE = "auto"). Reference being replaced: the native
torchaudio rnnt_loss call, espresso/criterions/transducer_loss.py:131-140.

Usage: python bench_rnnt.py [bf16|f32]   (default bf16, the training dtype)

Recorded 2026-08-18 on v5e (1 chip):
  f32 : value reldiff 7.4e-08; grad peak-rel <= 2.5e-3 (g_enc), others <=
        2.5e-4; pallas 18.06 ms vs xla 32.65 ms fwd+bwd -> 1.81x
  bf16: pallas 19.2 ms vs xla 33.5 ms fwd+bwd -> 1.75x
"""
import sys
import time

from espresso_tpu.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from espresso_tpu.ops.rnnt_fused import rnnt_loss_fused_xla
from espresso_tpu.ops.rnnt_pallas import (
    rnnt_loss_fused_pallas,
    supports_rnnt_pallas,
)

B, T, U, J, V = 16, 256, 100, 512, 1024
U1 = U + 1
blank = 0
dtype = jnp.bfloat16 if (len(sys.argv) < 2 or sys.argv[1] == "bf16") else jnp.float32
# bf16 inputs reorder reductions differently between the two paths; parity
# tolerances scale with the input dtype
VAL_TOL = 1e-6 if dtype == jnp.float32 else 3e-3
GRAD_TOL = 5e-3 if dtype == jnp.float32 else 5e-2

rng = np.random.default_rng(0)
enc = jnp.asarray(rng.standard_normal((B, T, J)) * 0.5, dtype)
dec = jnp.asarray(rng.standard_normal((B, U1, J)) * 0.5, dtype)
W = jnp.asarray(rng.standard_normal((J, V)) * 0.05, dtype)
b = jnp.asarray(rng.standard_normal((V,)) * 0.05, dtype)
tgt = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
src_len = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
tgt_len = jnp.asarray(rng.integers(U // 2, U + 1, (B,)), jnp.int32)

assert supports_rnnt_pallas(U1, J, V), "shape gate must pass at flagship shapes"


def loss_pallas(e, d, w, bb):
    return rnnt_loss_fused_pallas(e, d, w, bb, tgt, src_len, tgt_len, blank).sum()


def loss_xla(e, d, w, bb):
    return rnnt_loss_fused_xla(e, d, w, bb, tgt, src_len, tgt_len, blank).sum()


vg_p = jax.jit(jax.value_and_grad(loss_pallas, argnums=(0, 1, 2, 3)))
vg_x = jax.jit(jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3)))

print("compiling pallas...", flush=True)
t0 = time.perf_counter()
vp, gp = vg_p(enc, dec, W, b)
vp = float(np.asarray(vp))
print(f"pallas compiled+ran in {time.perf_counter()-t0:.1f}s val={vp:.4f}",
      flush=True)

print("compiling xla...", flush=True)
t0 = time.perf_counter()
vx, gx = vg_x(enc, dec, W, b)
vx = float(np.asarray(vx))
print(f"xla compiled+ran in {time.perf_counter()-t0:.1f}s val={vx:.4f}",
      flush=True)

vrel = abs(vp - vx) / max(abs(vx), 1e-9)
print(f"value reldiff: {vrel:.3e}", flush=True)
assert vrel < VAL_TOL, f"value parity FAILED: {vrel:.3e} >= {VAL_TOL}"
for name, a, c in zip(("g_enc", "g_dec", "g_W", "g_b"), gp, gx):
    a32 = np.asarray(a, np.float32)
    c32 = np.asarray(c, np.float32)
    denom = np.abs(c32).max() + 1e-9
    prel = np.abs(a32 - c32).max() / denom
    print(f"{name}: max abs diff {np.abs(a32-c32).max():.3e} "
          f"(peak-rel {prel:.3e})", flush=True)
    assert prel < GRAD_TOL, f"{name} parity FAILED: {prel:.3e} >= {GRAD_TOL}"
print("PARITY OK", flush=True)


def bench(fn, label, iters=20):
    v, g = fn(enc, dec, W, b)
    float(np.asarray(v))  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = fn(enc, dec, W, b)
    float(np.asarray(v))  # host fetch closes the clock
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label}: {ms:.2f} ms fwd+bwd", flush=True)
    return ms


ms_p = bench(vg_p, "pallas")
ms_x = bench(vg_x, "xla_chunked")
print(f"speedup: {ms_x/ms_p:.2f}x", flush=True)
