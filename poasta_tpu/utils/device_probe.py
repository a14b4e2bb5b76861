"""Bounded accelerator-availability probe.

On a tethered accelerator (this image's relay backend), the first
backend initialization — ``jax.devices()`` or any device op — blocks
*indefinitely* when the link is down (measured: >10 min with no error).
Benchmarks and on-chip test runners must not hang a driver on that;
they probe through a daemon thread with a deadline and report the
outcome instead.

The probe thread is left behind if it never returns (there is no way to
cancel a stuck PJRT init), which is why callers should treat a failed
probe as terminal for the process rather than retrying in-process.
"""

from __future__ import annotations

import threading


def accelerator_available(timeout_s: float = 900.0):
    """Return (ok: bool, detail: str) without risking an indefinite hang.

    ``ok`` is True when a non-CPU backend initialized within the
    deadline.  ``detail`` carries the backend/platform name or the
    failure mode ("timeout after Ns" / the exception text).
    """
    result: list = []

    def probe():
        try:
            import jax

            devs = jax.devices()
            result.append(("ok", jax.default_backend(), len(devs)))
        except Exception as exc:  # backend registration/init failure
            result.append(("err", str(exc)[:200], 0))

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result:
        return False, f"device enumeration timed out after {timeout_s:.0f}s"
    kind, detail, n = result[0]
    if kind == "err":
        return False, detail
    if detail == "cpu":
        return False, "cpu backend only (no accelerator)"
    return True, f"{detail} x{n}"
