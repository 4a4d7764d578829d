"""Device-health circuit breaker for the (remote, tunneled) TPU.

The axon-tunneled chip this framework targets suffers multi-minute
execution outages (observed live: a trivial jit round trip hanging
>400 s while the compile service stays up).  A stage-1 run that waits on
an in-flight prefilter dispatch during such an outage stalls the whole
pipeline behind device work the host could do itself in milliseconds
(measured 182 s vs 2.6 s on the bench prefilter workload).

This module gives device consumers a uniform escape hatch:

* ``call_with_timeout(fn)`` runs a blocking device pull on a daemon
  thread with a deadline (``SEDEF_DEVICE_TIMEOUT_S``, default 120 s —
  healthy collects are sub-second).
* On timeout the caller ``trip()``s the breaker and falls back to its
  host path (every device consumer here is an *accelerator* for an
  exact host path, so the fallback is always byte-identical).
* Once tripped, ``tripped()`` consumers skip further device dispatches
  for the rest of the process — no repeated 120 s stalls.

The reference has no analog (no device at all); the closest behavior is
sedef.sh's job-audit abort (sedef.sh:145-149), which this deliberately
improves on: degrade, don't die.
"""

from __future__ import annotations

import os
import sys
import threading

TIMEOUT_S = float(os.environ.get("SEDEF_DEVICE_TIMEOUT_S", "120"))

_tripped = threading.Event()


def tripped() -> bool:
    """True once any device pull has timed out this process."""
    return _tripped.is_set()


def trip(reason: str) -> None:
    """Trip the breaker (idempotent); warns on stderr the first time."""
    if not _tripped.is_set():
        print(f"[sedef-tpu] device breaker tripped: {reason}; "
              "continuing on host paths", file=sys.stderr, flush=True)
        _tripped.set()


def reset() -> None:
    """Re-arm (tests / explicit recovery)."""
    _tripped.clear()


def call_with_timeout(fn, timeout: float | None = None):
    """Run ``fn()`` on a daemon thread; returns (value, ok).

    ok=False means the deadline passed (the thread keeps running and is
    abandoned — it holds only device handles).  Exceptions from ``fn``
    propagate."""
    if timeout is None:
        timeout = TIMEOUT_S
    box: dict = {}

    def run():
        try:
            box["v"] = fn()
        except BaseException as e:  # noqa: BLE001 - reraised below
            box["e"] = e

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        return None, False
    if "e" in box:
        raise box["e"]
    return box.get("v"), True
