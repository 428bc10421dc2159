"""Checkpoint-on-preemption: turn SIGTERM into a clean save + exit.

TPU fleets reclaim preemptible/spot capacity by delivering SIGTERM a
grace period before the hard kill (and orchestrators send the same on
eviction). The reference has no equivalent — a preempted Accelerate DDP
run loses everything since the last ``save_interval`` (up to 5000 steps
at its default cadence). Here both trainers poll a signal-set flag once
per step and perform one final checkpoint save before returning, so a
preempted run resumes from the exact step it was cut at.

Usage (see train/trainer.py):

    with PreemptionGuard() as preempt:
        for step in range(start, total):
            ...train one step...
            if preempt.triggered:
                ckpt.save(state, step + 1)
                break

SIGUSR1 is handled too (common "preemption imminent" warning channel);
SIGINT is deliberately NOT intercepted — Ctrl-C should keep its default
semantics.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Iterable

log = logging.getLogger("onedc.preempt")


class PreemptionGuard:
    """Context manager installing save-and-exit signal handlers.

    Re-entrant per process but not nested; restores the previous
    handlers on exit. Outside the main thread (where CPython forbids
    ``signal.signal``) it degrades to an inert guard with a warning —
    training proceeds, just without preemption protection.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,
                                                 signal.SIGUSR1)):
        self._signals = tuple(signals)
        self._old: dict = {}
        self._event = threading.Event()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def _handler(self, signum, frame):  # noqa: ARG002 (signal API)
        log.warning("received signal %d: will checkpoint and stop after "
                    "the current step", signum)
        self._event.set()

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            try:
                self._old[s] = signal.signal(s, self._handler)
            except ValueError:  # not the main thread
                log.warning("cannot install handler for signal %d outside "
                            "the main thread; preemption guard inactive", s)
                break
        return self

    def __exit__(self, *exc) -> bool:
        for s, h in self._old.items():
            signal.signal(s, h)
        self._old.clear()
        return False
