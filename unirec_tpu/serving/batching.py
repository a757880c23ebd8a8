"""Cross-request micro-batching for the serving path.

The round-1 server answered each HTTP request with a batch-1 call into the
fixed-shape batch-N jit forward — concurrent clients serialized and the
device ran 1/N full (VERDICT r1 weak #4).  ``MicroBatcher`` coalesces
concurrent requests into full device batches: requests enqueue from handler
threads; a single dispatcher thread drains the queue, waits up to
``max_wait_ms`` for the batch to fill (bounded added latency), runs ONE
batched ``Recommender.recommend``/``score`` call, and fans results back out.

One dispatcher thread also serializes device access — handler threads never
touch JAX directly, so the threaded HTTP server needs no device locking.

Failure isolation: a batch-level exception triggers a per-request retry, so
one malformed request cannot 500 its co-batched neighbors.  The default
``request_timeout_s`` budgets for a first-request jit compile (minutes
through the axon remote-compile tunnel — CLAUDE.md); call ``warmup()``
before opening traffic to pay it up front instead.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import List, Optional, Sequence


class _Pending:
    __slots__ = ("history", "k", "event", "result", "error")

    def __init__(self, history: Sequence[str], k: int):
        self.history = list(history)
        self.k = k
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None


class MicroBatcher:
    """Batches concurrent ``recommend`` calls into full device batches."""

    def __init__(
        self,
        recommender,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 3.0,
        request_timeout_s: float = 600.0,
    ):
        self.rec = recommender
        self.max_batch = max_batch or recommender.batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.request_timeout_s = request_timeout_s
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self.batches_run = 0
        self.requests_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the dispatcher and promptly fail queued/late requests
        (without this, in-flight clients would sleep the full
        ``request_timeout_s`` on an event nobody will ever set)."""
        self._stop.set()
        self._thread.join(timeout=5.0)
        self._drain_rejecting()

    def _drain_rejecting(self) -> None:
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                return
            p.error = RuntimeError("server shutting down")
            p.event.set()

    def warmup(self, k: int = 10) -> None:
        """Run one full-shape batch through the recommender so the jit
        compile (minutes through the remote-compile tunnel on first use)
        happens before traffic is admitted."""
        self.recommend([], k=self._bucket_k(k))

    # -- client side --------------------------------------------------------

    def recommend(self, history: Sequence[str], k: int = 10) -> List:
        """Blocking call from a handler thread; batched under the hood."""
        if self._stop.is_set():
            raise RuntimeError("server shutting down")
        p = _Pending(history, k)
        self._q.put(p)
        if not p.event.wait(self.request_timeout_s):
            raise TimeoutError("recommendation timed out")
        if p.error is not None:
            raise p.error
        return p.result

    # -- dispatcher ---------------------------------------------------------

    def _bucket_k(self, k: int) -> int:
        # bucket k to multiples of 10 (results are sliced per request) so
        # mixed-k traffic shares one retrieval shape; cap at the catalog
        # size so an oversized k cannot force an impossible top-K shape
        k = ((max(k, 1) + 9) // 10) * 10
        return min(k, len(self.rec.catalog_ids))

    def _collect(self) -> List[_Pending]:
        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self, batch: List[_Pending]) -> None:
        k_max = self._bucket_k(max(p.k for p in batch))
        histories = [p.history for p in batch]
        # ALWAYS submit exactly max_batch rows: a partially-filled batch
        # changes the [n_users, D] retrieval shape and triggers a fresh
        # jit trace (+ a multi-second remote compile through the axon
        # tunnel) per distinct fill level
        while len(histories) < self.max_batch:
            histories.append([])
        results = self.rec.recommend(histories, k=k_max)
        for p, recs in zip(batch, results):
            p.result = recs[: p.k]

    def _loop(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            try:
                self._run(batch)
            except Exception:
                # isolate the offender: retry each request alone (same
                # compiled shapes — a solo request still pads to max_batch)
                # so only the failing request surfaces its error
                for p in batch:
                    try:
                        self._run([p])
                    except Exception as e:
                        p.error = e
            finally:
                self.batches_run += 1
                self.requests_served += len(batch)
                for p in batch:
                    p.event.set()
        self._drain_rejecting()
