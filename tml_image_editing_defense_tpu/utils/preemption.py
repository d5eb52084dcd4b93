"""Preemption/failure handling.

The reference *requests* a SLURM preemption warning signal but never handles
it (``#SBATCH --signal=USR1@120``, ``tml_project.slurm:7`` — SURVEY.md §5
"requested but never handled in code").  Here SIGTERM/SIGUSR1 set a flag the
PGD loop polls between jitted steps; the api layer then checkpoints
(X_adv, iteration, RNG key, noise pool) and exits cleanly, so a re-launched
job resumes with ``immunize(..., resume_from=...)``.
"""

from __future__ import annotations

import contextlib
import signal
import threading
from typing import Iterator


class PreemptionFlag:
    def __init__(self):
        self._event = threading.Event()
        self.signum = None

    def set(self, signum=None):
        self.signum = signum
        self._event.set()

    def __bool__(self) -> bool:
        return self._event.is_set()


@contextlib.contextmanager
def preemption_guard(signals=(signal.SIGTERM, signal.SIGUSR1)) -> Iterator[PreemptionFlag]:
    """Install handlers for the given signals; restores previous handlers on
    exit.  Only usable from the main thread (signal module constraint) —
    degrades to a never-set flag elsewhere."""
    flag = PreemptionFlag()
    previous = {}
    installed = False
    try:
        for s in signals:
            previous[s] = signal.signal(s, lambda signum, frame: flag.set(signum))
        installed = True
    except ValueError:  # not the main thread
        pass
    try:
        yield flag
    finally:
        if installed:
            for s, h in previous.items():
                signal.signal(s, h)
