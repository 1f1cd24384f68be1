"""Retry / timeout / tolerant-map semantics for flaky per-element calls
(operators C4, C5, X4, X5 in SURVEY.md §2).

Reproduces the reference's Vision-OCR resilience loop
(``apps/ocr/src/lib/ocr-utils.ts:107-152``) exactly:

* up to ``max_retries`` RETRIES after the first attempt (3 retries = 4
  attempts total, the ``while (retries <= maxRetries)`` shape);
* exponential backoff between attempts: ``base_delay * 2^(retries-1) +
  jitter()`` with jitter uniform in [0, 1s) (ocr-utils.ts:146-148);
* a per-attempt timeout (60 s) implemented as a race — the underlying
  call is NOT cancelled on timeout, faithfully matching the reference's
  ``Promise.race`` (the losing promise keeps running there too);
* exhaustion re-raises the last error (ocr-utils.ts:142-144).

Each timed attempt runs on its OWN single-use daemon thread: a timed-out
call keeps running (race semantics), so reusing a worker would queue the
retry — and every later element of a batch — behind the hung call,
failing them spuriously. Spawning a thread costs microseconds against the
millisecond-scale external calls these wrappers exist for; the hung
thread is simply abandoned and, being a daemon, cannot wedge interpreter
shutdown.

How this maps onto Spark: these wrappers run INSIDE Arrow-batched UDFs,
giving per-ELEMENT resilience against a flaky external dependency (an OCR
service, a feature store) without failing the whole task; Spark's own
``spark.task.maxFailures`` remains the outer, per-TASK retry layer for
crashes — the two compose, reference retry loop : task retry ::
per-document : per-partition. ``tolerant_map`` adds the X5 contract on
top: an element whose retries exhaust yields (None, ok=False) instead of
poisoning the batch (``apps/legacy/src/fileProcessor.ts:63-77`` records
the failure and continues the run).

Clock, sleep, and jitter are injectable so tests pin the schedule
deterministically; production defaults use the real ones.
"""

from __future__ import annotations

import queue as _queue
import random
import threading
import time
from collections.abc import Callable, Iterable
from dataclasses import dataclass


class AttemptTimeout(Exception):
    """Raised when one attempt exceeds the per-attempt timeout (the
    reference's `new Error("Vision API timeout")`)."""


@dataclass(frozen=True)
class RetryPolicy:
    max_retries: int = 3  # retries AFTER the first attempt
    base_delay: float = 1.0  # seconds (reference: 1000 ms)
    timeout: float | None = 60.0  # per-attempt seconds; None = no timeout

    def backoff(self, retries: int, jitter: float) -> float:
        """Delay before retry number `retries` (1-based), ocr-utils.ts:147."""
        return self.base_delay * (2 ** (retries - 1)) + jitter


def _attempt_with_timeout(fn: Callable, args: tuple, timeout: float):
    """One raced attempt on a fresh single-use DAEMON thread. The thread
    is abandoned on timeout — never reused — so a hung call cannot block
    later attempts or later batch elements, and (being a daemon) cannot
    block interpreter shutdown either (ThreadPoolExecutor workers are
    non-daemon and are joined at exit, which a hung call would wedge)."""
    result: _queue.Queue = _queue.Queue(maxsize=1)

    def runner() -> None:
        try:
            result.put(("ok", fn(*args)))
        except BaseException as e:  # noqa: BLE001 — relayed to the caller
            result.put(("err", e))

    threading.Thread(target=runner, daemon=True).start()
    try:
        kind, value = result.get(timeout=timeout)
    except _queue.Empty:
        raise AttemptTimeout(f"attempt timed out after {timeout}s") from None
    if kind == "err":
        raise value
    return value


def call_with_retries(
    fn: Callable,
    *args,
    policy: RetryPolicy = RetryPolicy(),
    sleep: Callable[[float], None] = time.sleep,
    jitter: Callable[[], float] = lambda: random.random(),
):
    """Run `fn(*args)` under the reference's retry loop. Returns fn's
    result; re-raises the final error after max_retries retries."""
    retries = 0
    while True:
        try:
            if policy.timeout is None:
                return fn(*args)
            return _attempt_with_timeout(fn, args, policy.timeout)
        except Exception:
            retries += 1
            if retries > policy.max_retries:
                raise
            sleep(policy.backoff(retries, jitter()))


def tolerant_map(
    items: Iterable,
    fn: Callable,
    policy: RetryPolicy = RetryPolicy(),
    sleep: Callable[[float], None] = time.sleep,
    jitter: Callable[[], float] = lambda: random.random(),
) -> list[tuple[object, bool, str | None]]:
    """Per-element tolerant map (X5): [(result_or_None, ok, error_msg)]."""
    out: list[tuple[object, bool, str | None]] = []
    for item in items:
        try:
            out.append(
                (
                    call_with_retries(
                        fn, item, policy=policy, sleep=sleep, jitter=jitter
                    ),
                    True,
                    None,
                )
            )
        except Exception as e:  # noqa: BLE001 — the tolerant contract
            out.append((None, False, f"{type(e).__name__}: {e}"))
    return out
