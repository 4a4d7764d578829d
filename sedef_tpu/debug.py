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
