"""Stall watchdog: convert a hung TPU run into a restartable failure.

The reference has no failure detection of any kind (SURVEY.md section 5:
its only resilience is AUTO_RESUME from ``checkpoint.pth``,
``/root/reference/tools/train.py:192-202``).  On TPU that is not enough:
if the device transport drops mid-run (observed on this box: the relay
went unresponsive and a training process sat blocked inside a device
fetch for an hour, making zero progress), the process hangs *forever* —
no exception, no exit, no supervisor signal.

``StallWatchdog`` closes that gap.  The train/eval loops call ``beat()``
every time they complete an iteration; a daemon thread checks the time
since the last beat.  If it exceeds ``timeout_s`` the watchdog

1. logs the stall and dumps every thread's stack (``faulthandler``) so
   the blocking frame is visible post-mortem,
2. runs any registered ``on_stall`` callbacks (e.g. flushing pending
   host-side checkpoint writes) on a daemon helper with a hard time
   budget — a callback that itself blocks on the dead transport cannot
   stop the exit,
3. force-exits with ``exit_code`` (``os._exit`` — a blocked device fetch
   holds locks that make a clean ``sys.exit`` unreachable).

A supervisor (shell loop, cron, cluster runtime) restarts the CLI and
``AUTO_RESUME`` restores the last rolling checkpoint, so the cost of a
transport loss drops from "the run is dead" to "redo at most
``TRAIN.CKPT_FREQ`` epochs".

Enabled via ``TPU.STALL_TIMEOUT_S`` (default 0 = off).  The timeout is
armed only once the FIRST beat arrives: the first train step includes
XLA compilation (minutes on a cold cache) and must not count against the
steady-state step budget.  Choose a timeout comfortably above an eval
pass plus one PRINT_FREQ window; stalls the watchdog targets are total
(tens of minutes), not marginal.
"""

from __future__ import annotations

import faulthandler
import os
import threading
import time

__all__ = ["StallWatchdog", "null_watchdog"]

DEFAULT_EXIT_CODE = 86  # distinct from shell/timeout codes; supervisors
                        # can treat it as "stalled: restart me"


class StallWatchdog:
    """Daemon-thread liveness monitor for a device-bound loop.

    Parameters
    ----------
    timeout_s: stall threshold.  <= 0 disables (every method is a no-op),
        so call sites can construct one unconditionally.
    logger: stdlib logger for the stall report (optional).
    on_stall: iterable of zero-arg callables run before exiting; errors
        are swallowed (the process is about to die anyway).
    exit_fn: test seam; defaults to ``os._exit``.
    poll_s: check interval of the monitor thread.
    """

    def __init__(self, timeout_s: float, logger=None, on_stall=(),
                 exit_code: int = DEFAULT_EXIT_CODE, exit_fn=None,
                 poll_s: float | None = None,
                 callback_timeout_s: float = 30.0):
        self.timeout_s = float(timeout_s)
        self.enabled = self.timeout_s > 0
        self.logger = logger
        self.on_stall = tuple(on_stall)
        self.exit_code = exit_code
        self.callback_timeout_s = float(callback_timeout_s)
        self.exit_fn = exit_fn if exit_fn is not None else os._exit
        self.poll_s = poll_s if poll_s else min(max(self.timeout_s / 4, 0.05), 30.0)
        self._last_beat = None  # armed by the first beat()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = None
        self.fired = False
        if self.enabled:
            self._thread = threading.Thread(
                target=self._run, name="fhpe-stall-watchdog", daemon=True)
            self._thread.start()

    # -- loop-side API ----------------------------------------------------
    def beat(self):
        """Record forward progress (cheap; called once per iteration)."""
        if self.enabled:
            with self._lock:
                self._last_beat = time.monotonic()

    def disarm(self):
        """Suspend monitoring until the next beat (e.g. across a known
        long device-free section such as a dataset evaluation)."""
        if self.enabled:
            with self._lock:
                self._last_beat = None

    def stop(self):
        """Shut the monitor down (end of run)."""
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    # -- monitor thread ---------------------------------------------------
    def _run(self):
        while not self._stop.wait(self.poll_s):
            with self._lock:
                last = self._last_beat
            if last is None:  # not armed yet (compiling / disarmed)
                continue
            idle = time.monotonic() - last
            if idle >= self.timeout_s:
                self._fire(idle)
                return

    def _fire(self, idle: float):
        self.fired = True
        msg = (f"STALL WATCHDOG: no progress for {idle:.0f}s "
               f"(timeout {self.timeout_s:.0f}s) — device transport "
               f"presumed lost; dumping thread stacks and exiting "
               f"{self.exit_code} for supervised restart (AUTO_RESUME "
               f"restores the last checkpoint)")
        if self.logger is not None:
            try:
                self.logger.error(msg)
                for h in self.logger.handlers:
                    try:
                        h.flush()
                    except Exception:
                        pass
            except Exception:
                pass
        try:
            faulthandler.dump_traceback(all_threads=True)
        except Exception:
            pass
        # Callbacks run on a daemon helper with a hard time budget: a
        # callback that itself blocks on the dead transport/storage (e.g.
        # flush_pending joining a wedged checkpoint write) must not stop
        # the force-exit — guaranteeing the exit is this class's one job.
        def run_callbacks():
            for cb in self.on_stall:
                try:
                    cb()
                except Exception:
                    pass
        t = threading.Thread(target=run_callbacks, daemon=True,
                             name="fhpe-stall-callbacks")
        t.start()
        t.join(timeout=self.callback_timeout_s)
        self.exit_fn(self.exit_code)


def null_watchdog() -> StallWatchdog:
    """A disabled watchdog (all methods no-ops) for default call sites."""
    return StallWatchdog(0.0)
