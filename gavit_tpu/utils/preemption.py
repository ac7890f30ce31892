"""Preemption-aware training for TPU VMs (SURVEY §5: the reference has no
fault tolerance; on preemptible TPU slices SIGTERM arrives ~30s before the
VM dies).

``PreemptionHandler`` latches SIGTERM/SIGINT; the trainer polls it at epoch
(and optionally step) boundaries, saves a full-resume checkpoint, and exits
cleanly. Combined with ``scripts/train.py --resume auto`` (restores the
latest checkpoint in ``save_dir``) training survives arbitrary kill/restart
cycles with exact-trajectory resume.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class PreemptionHandler:
    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = threading.Event()
        self._prev = {}
        self._signals = signals

    def install(self):
        for sig in self._signals:
            try:
                self._prev[sig] = signal.signal(sig, self._on_signal)
            except ValueError:
                # not the main thread (e.g. under pytest-xdist) — skip
                logger.warning(f"cannot install handler for {sig!r}")
        return self

    def _on_signal(self, signum, frame):
        logger.warning(
            f"Received signal {signum}: checkpointing at next safe point"
        )
        self._flag.set()

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
