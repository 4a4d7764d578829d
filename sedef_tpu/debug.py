"""SEDEFDBG debug channel (reference analog: the ``dprn`` macro,
common.h:33-47 — compiled out under NDEBUG and gated at runtime by the
SEDEFDBG environment variable).  Here it is always compiled but costs one
cached boolean check when off."""

from __future__ import annotations

import os
import sys

_ON = bool(os.environ.get("SEDEFDBG", ""))


def dprn(fmt: str, *args) -> None:
    """Debug print to stderr, active only when SEDEFDBG is set."""
    if _ON:
        print(fmt.format(*args) if args else fmt, file=sys.stderr,
              flush=True)


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for production entry points.

    Each distinct jit variant costs tens of seconds through this
    environment's remote TPU compile service; a disk cache brings warm
    runs to milliseconds (tests/conftest.py does the same for the test
    suite).  Honors JAX_COMPILATION_CACHE_DIR if already set; defaults to
    <repo>/.cache/jax.  Safe to call multiple times / before first
    backend use."""
    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".cache", "jax"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
