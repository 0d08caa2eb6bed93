"""S12: rate-limited liveness ping (reference ``Importer::ping_url``,
src/importer/mod.rs:266-292).

The reference's automatic importer GETs a monitoring URL after each
iteration, at most once per minute, under a mutex (concurrent worker
threads), and ignores the response entirely — it is a dead-man switch
for an external uptime monitor, not a data operator.  The Spark analog
is a driver-side callback invoked between streaming micro-batches or
import loops (e.g. from a ``StreamingQueryListener.onQueryProgress`` or
the poll loop in streaming/pipeline.py); it never runs on executors.

stdlib-only (urllib), errors swallowed: a monitoring outage must never
fail the pipeline (the reference's ``get(url).call()`` discards the
Result the same way).
"""

from __future__ import annotations

import threading
import time
import urllib.request


class RateLimitedPing:
    """Thread-safe at-most-once-per-interval HTTP GET.

    ``maybe_ping()`` mirrors the reference exactly: the *attempt* time
    is recorded under the lock before the request is made (so a slow
    request doesn't let a second thread ping concurrently), the request
    itself runs outside the lock, and failures are swallowed.
    Returns True iff a request was attempted.
    """

    def __init__(
        self,
        url: str | None,
        min_interval_s: float = 60.0,
        timeout_s: float = 10.0,
        clock=time.monotonic,
        opener=None,
    ) -> None:
        self.url = url
        self.min_interval_s = float(min_interval_s)
        self.timeout_s = float(timeout_s)
        self._clock = clock
        self._opener = opener or urllib.request.urlopen
        self._lock = threading.Lock()
        self._last_attempt: float | None = None

    def maybe_ping(self) -> bool:
        if not self.url:
            return False
        with self._lock:
            now = self._clock()
            if (
                self._last_attempt is not None
                and now - self._last_attempt < self.min_interval_s
            ):
                return False
            self._last_attempt = now
        try:
            with self._opener(self.url, timeout=self.timeout_s) as resp:
                resp.read(0)
        except Exception:
            pass  # liveness ping must never break the import loop
        return True
