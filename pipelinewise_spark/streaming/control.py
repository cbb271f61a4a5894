"""Graceful shutdown for continuous tails — the ``pipelinewise
stop_tap`` analog (reference: cli/pipelinewise.py:1320-1380, which
signals the running tap and waits for it to exit so its STATE file
stays consistent).

Here there is no separate state file to protect: the stream bookmark
commits atomically WITH the data in each manifest version, so stopping
at any instant is safe — a micro-batch either committed (the rerun's
batch-id guard no-ops it) or it didn't (the checkpoint replays it, the
LSN filter keeps the apply idempotent). The handler's job is purely
operational: turn SIGTERM/SIGINT into a clean ``query.stop()`` +
exit 0 instead of a stack trace and a non-zero status that pages
someone.

The shape matters: the signal handler must NOT call into the JVM. It
fires on the main thread, which at that moment is usually blocked
INSIDE a py4j call (``awaitTermination``) — a re-entrant
``query.stop()`` from the handler interleaves two commands on the same
gateway connection and corrupts the protocol (Py4JNetworkError, hung
driver). So the handler only sets a flag, and :func:`run_until_stopped`
polls ``awaitTermination`` in short steps, issuing the ``stop()`` from
the main loop between calls.
"""

from __future__ import annotations

import signal
import time


def run_until_stopped(
    query,
    *,
    signals=(signal.SIGTERM, signal.SIGINT),
    poll_sec: float = 1.0,
    timeout_sec: float | None = None,
    stop_grace_sec: float = 60.0,
) -> bool:
    """Block until ``query`` terminates on its own (availableNow drain
    done), a signal asks for a clean stop, or ``timeout_sec`` expires.

    Returns True when the query terminated (own end OR signal-stop),
    False on timeout (caller decides whether to ``stop()`` and error).
    Must run on the main thread (CPython signal delivery rule); the
    previous signal handlers are restored before returning.

    The post-stop wait is bounded by ``stop_grace_sec``: if a wedged
    micro-batch keeps the query from terminating, we return (and warn)
    rather than block forever with the signal handlers still swallowing
    every further SIGTERM — process exit tears the session down either
    way, and the checkpoint makes that safe."""
    import sys

    stop_requested = False

    def handler(signum, frame):
        nonlocal stop_requested
        stop_requested = True  # flag only — see module docstring

    prev = {s: signal.signal(s, handler) for s in signals}
    deadline = (time.monotonic() + timeout_sec) if timeout_sec else None
    try:
        while True:
            step = poll_sec
            if deadline is not None:
                step = min(poll_sec, max(deadline - time.monotonic(), 0.01))
            if query.awaitTermination(step):
                return True
            if stop_requested:
                query.stop()
                if not query.awaitTermination(stop_grace_sec):
                    print(
                        f"stream did not terminate within {stop_grace_sec}s "
                        f"of stop(); exiting anyway (checkpoint resumes)",
                        file=sys.stderr,
                    )
                return True
            if deadline is not None and time.monotonic() >= deadline:
                return False
    finally:
        for s, h in prev.items():
            signal.signal(s, h)
