"""Hang watchdog for long training runs.

The reference's failure story is crash-and-rerun (`--restore`,
`/root/reference/Generation/model.py:189-195`) — a crash at least *exits*.
On TPU pods the uglier failure mode is a wedged device dispatch: the client
blocks forever inside an RPC (observed in this environment as a
futex-parked process with an idle relay socket), the process never dies,
and a multi-hour campaign silently stops making progress.

`Watchdog` turns that into the crash the restore path already handles: a
daemon thread checks a heartbeat the training loop beats after every
dispatch; when the heartbeat goes stale past the timeout it runs the
timeout action — by default logging and `os._exit` (a hung JAX client
cannot be recovered in-process; the exit must not wait on Python
finalizers, which may themselves block on the wedged runtime). A
supervisor (`scripts/campaign_supervised.sh`) restarts the run with
`--restore`, losing at most one snapshot interval.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Optional

# distinct exit code so supervisors can tell "hung, restart me" from a real
# crash
EXIT_CODE = 42


class Watchdog:
    """Fires `on_timeout` when `beat()` hasn't been called for `timeout_s`.

    The clock only runs between `start()`/`stop()`; `stop()` is safe to call
    from the watched thread right before clean exit. The checker is a daemon
    thread so it never blocks interpreter shutdown.
    """

    def __init__(self, timeout_s: float,
                 on_timeout: Optional[Callable[[float], None]] = None,
                 poll_s: float = 5.0):
        self.timeout_s = float(timeout_s)
        self.poll_s = min(poll_s, max(0.05, self.timeout_s / 4))
        self._on_timeout = on_timeout or self._default_timeout
        self._beat = time.monotonic()
        self._stop = threading.Event()
        self._fired = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- the watched side ------------------------------------------------
    def beat(self):
        self._beat = time.monotonic()

    def start(self):
        self.beat()
        self._thread = threading.Thread(
            target=self._run, name="spgan-watchdog", daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    @property
    def fired(self) -> bool:
        return self._fired.is_set()

    # -- internals ---------------------------------------------------------
    def _run(self):
        while not self._stop.wait(self.poll_s):
            stale = time.monotonic() - self._beat
            if stale > self.timeout_s:
                self._fired.set()
                self._on_timeout(stale)
                return

    @staticmethod
    def _default_timeout(stale: float):
        msg = (f"[watchdog] no training progress for {stale:.0f}s — "
               f"device dispatch presumed wedged; exiting {EXIT_CODE} "
               "for supervised restart (--restore)")
        print(msg, flush=True)
        # os._exit: a hung device client can block atexit/GC finalizers
        # indefinitely — skip them
        os._exit(EXIT_CODE)
