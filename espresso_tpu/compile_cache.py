"""Persistent XLA compilation cache shared by benches, CLIs, and the
driver hooks.

Cold compiles of the flagship programs take minutes on the tunneled v5e
(CLAUDE.md) — long enough that a fresh-process bench run can blow an
external time budget before printing anything (the round-4 driver bench
timed out exactly this way). JAX's persistent compilation cache
(`jax_compilation_cache_dir`) keys each executable on (HLO, compile
options, backend version), so a second process re-running the same
program skips straight to execution. This module turns it on with one
call, placed before the first computation in every entry point.

The reference counterpart is build-time compilation of its CUDA
extensions (e.g. /root/reference/fairseq/clib — compiled once at
install); under XLA the programs are compiled at run time, so run-time
caching is the TPU-native equivalent.

MEASURED CAVEAT (v5e over the axon tunnel, 2026-08-20): cache WRITES are
cheap, but a cache READ of a multi-MB executable must ship the serialized
program back through the tunnel and load it — measured as a multi-minute
stall (>850 s, killed) for the 52 MB flagship decode executable, while a
fresh server-side compile of the same program takes ~90-170 s. So huge
entries are strictly worse than recompiling here. :func:`_prune_oversized`
deletes any entry above ESPRESSO_COMPILE_CACHE_MAX_BYTES (default 4 MB) at
every entry-point startup; the cache then serves the long tail of small
programs (param init, eager ops, per-bucket jits — measured 177 s -> 43 s
on bench.py's init stage) and the mega-programs recompile from HLO.

Env knobs:
  ESPRESSO_COMPILE_CACHE=0          disable entirely
  ESPRESSO_COMPILE_CACHE_DIR        overrides the repo-local .jax_cache
  ESPRESSO_COMPILE_CACHE_MAX_BYTES  oversized-entry prune threshold
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def _prune_oversized(cache_dir: str, max_bytes: int) -> None:
    try:
        for name in os.listdir(cache_dir):
            p = os.path.join(cache_dir, name)
            try:
                if os.path.isfile(p) and os.path.getsize(p) > max_bytes:
                    os.unlink(p)
            except OSError:
                pass
    except OSError:
        pass


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Safe to call multiple times and at any point before (or after) jax
    initialization; returns the cache dir in use, or None when disabled.
    """
    if os.environ.get("ESPRESSO_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("ESPRESSO_COMPILE_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    max_bytes = int(
        os.environ.get("ESPRESSO_COMPILE_CACHE_MAX_BYTES", str(4 * 1024 * 1024))
    )
    _prune_oversized(cache_dir, max_bytes)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return None
    # cache aggressively BELOW the size cap: the win is the long tail of
    # small/medium programs; oversized entries are pruned above (reads of
    # multi-MB executables stall on the tunnel — docstring). These
    # threshold knobs are best-effort: if a jax version lacks one, the
    # cache is STILL enabled (dir set above) with that version's
    # defaults — so the return value keeps reporting it as on.
    for knob, value in (
        ("jax_persistent_cache_min_compile_time_secs", 0.5),
        ("jax_persistent_cache_min_entry_size_bytes", -1),
    ):
        try:
            jax.config.update(knob, value)
        except Exception:
            pass
    return cache_dir
