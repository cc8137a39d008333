"""Persistent XLA compilation cache setup — one shared knob for every tool.

Why this exists: each remote compile through the axon tunnel costs ~60 s
fixed and the service serializes requests, so a fresh process without a
warm persistent cache pays 17-35 min before a single 4K measurement
(CLAUDE.md round-4 note). Round 4 pointed the cache at
``/tmp/tpuflow_jit_cache``, which the machine cleans between rounds —
the cache silently never persisted. The cache now lives INSIDE the repo
(``<repo>/.jit_cache``, gitignored) so it survives /tmp cleanup and is
trivially inspectable; override with ``TPUFLOW_JIT_CACHE``.

Call :func:`setup_jit_cache` BEFORE importing jax (it sets env vars jax
reads at import) — every bench/tool entry point does. It returns the
cache dir and prints a one-line entry count (suppress with
``quiet=True``) so a run's compile behavior is visible: "N entries"
at startup vs at exit tells you exactly how many programs missed.

The reference has no compilation-cache analogue (CUDA kernels are
compiled out-of-band to PTX by the Makefile, reference Makefile:54-61);
this is the TPU-era equivalent of shipping prebuilt PTX next to the
binary.
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO, ".jit_cache")


def cache_entry_count(path: str) -> int:
    """Number of cache entries currently on disk (0 if dir absent)."""
    try:
        return sum(1 for n in os.listdir(path) if n.endswith("-cache"))
    except OSError:
        return 0


def trim_cache(path: str, max_bytes: int) -> int:
    """LRU-trim the cache dir to max_bytes (by mtime; jax does not evict
    on its own and one 4K pipeline entry is ~100-500 MB — a round's
    measurement session can grow the dir by tens of GB). Returns the
    number of entries removed."""
    try:
        entries = [
            (os.path.getmtime(p), os.path.getsize(p), p)
            for n in os.listdir(path)
            if n.endswith("-cache") and os.path.isfile(p := os.path.join(path, n))
        ]
    except OSError:
        return 0
    total = sum(sz for _, sz, _ in entries)
    removed = 0
    for _, sz, p in sorted(entries):
        if total <= max_bytes:
            break
        try:
            os.remove(p)
            total -= sz
            removed += 1
        except OSError:
            pass
    return removed


def setup_jit_cache(quiet: bool = False) -> str:
    """Point jax's persistent compilation cache at the repo-local dir.

    Safe to call before OR after ``import jax``: env vars cover the
    pre-import path; if jax is already imported we also push the config
    update directly. Idempotent.
    """
    path = os.environ.get("TPUFLOW_JIT_CACHE", DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    import sys

    import jax

    try:
        # config.update (not env vars): the machine's sitecustomize shim
        # pins jax config at import, so JAX_PERSISTENT_CACHE_* env vars
        # are NOT honored here (verified: threshold stayed at the 1.0 s
        # default with the env var set). Both knobs are read per-compile,
        # so updating after import is safe.
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    max_gb = float(os.environ.get("TPUFLOW_JIT_CACHE_MAX_GB", "40"))
    dropped = trim_cache(path, int(max_gb * 1e9))
    if not quiet:
        n = cache_entry_count(path)
        extra = f" (trimmed {dropped})" if dropped else ""
        print(f"[tpuflow] jit-cache: {n} entries at {path}{extra}",
              file=sys.stderr, flush=True)
    return path
