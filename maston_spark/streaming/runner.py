"""Fail-fast lifecycle runner for streaming queries.

Parity: ``KafkaStreamsDecorator.java:24-43`` — the reference's
production entry point starts the topology, busy-waits until the
streams app reaches RUNNING, registers a JVM shutdown hook that
closes the app, and treats BOTH startup failures and uncaught
stream-thread exceptions as fatal: log, then ``System.exit(1)`` so
the orchestrator (k8s) restarts the pod with a clean slate.

:func:`run_forever` is the Spark twin: it blocks on one or more
``StreamingQuery`` handles, detects terminal failure via
``query.exception()``, stops every sibling query, runs the
registered shutdown hooks, and invokes ``on_exit(1)`` (default
``sys.exit``) — the same restart-me contract. SIGTERM/SIGINT map to
the reference's shutdown hook: stop queries cleanly, run hooks, and
return 0 (a requested stop is not a failure).

Everything is injectable for tests: ``on_exit``, hooks, poll cadence.
"""

from __future__ import annotations

import logging
import signal
import sys
import time
from typing import Callable, Sequence

LOGGER = logging.getLogger("maston_spark.runner")


def run_forever(
    queries,
    *,
    on_exit: Callable[[int], None] = sys.exit,
    shutdown_hooks: Sequence[Callable[[], None]] = (),
    poll_interval: float = 0.5,
    install_signal_handlers: bool = True,
    logger: logging.Logger = LOGGER,
) -> int:
    """Await one or more streaming queries with fail-fast semantics.

    Returns 0 when every query stops cleanly (or a shutdown signal
    was received); on any terminal query exception, stops the
    remaining queries, runs ``shutdown_hooks``, calls ``on_exit(1)``
    and returns 1 (reachable only when ``on_exit`` doesn't raise,
    e.g. in tests).

    Scale note: this is driver-only supervision — one poll loop per
    application regardless of executor count; nothing here touches
    the data path.
    """
    qs = list(queries) if isinstance(queries, (list, tuple)) else [queries]
    if not qs:
        raise ValueError("run_forever needs at least one StreamingQuery")

    stop_requested = {"flag": False}

    def _signal_handler(signum, frame):  # noqa: ARG001
        logger.info("received signal %s — shutting down streams", signum)
        stop_requested["flag"] = True

    if install_signal_handlers:
        try:
            signal.signal(signal.SIGTERM, _signal_handler)
            signal.signal(signal.SIGINT, _signal_handler)
        except ValueError:
            # not the main thread (tests, notebook) — polling still works
            pass

    def _close_all() -> None:
        # parity: Runtime shutdown hook calling streams::close (:37)
        for q in qs:
            try:
                if q.isActive:
                    q.stop()
            except Exception:  # noqa: BLE001 — best-effort teardown
                logger.exception("error stopping query %s", q.name or q.id)
        for hook in shutdown_hooks:
            try:
                hook()
            except Exception:  # noqa: BLE001
                logger.exception("shutdown hook failed")

    def _fail(reason: object) -> int:
        # parity: logAndShutdown (:40-43) — log, close, exit nonzero
        logger.error(
            "Something went wrong while streaming data. %s", reason
        )
        _close_all()
        on_exit(1)
        return 1

    try:
        # parity: busy-wait to RUNNING (:31-33) — each query must come
        # up active (or already have failed fast at startup)
        for q in qs:
            if not q.isActive:
                exc = q.exception()
                if exc is not None:
                    return _fail(exc)
                # started handles are active or terminated — inactive with
                # no exception means it already finished cleanly (e.g. an
                # availableNow trigger that drained before we got here);
                # waiting for isActive would spin forever
                logger.info(
                    "streaming query already finished: name=%s id=%s runId=%s",
                    q.name, q.id, q.runId,
                )
                continue
            logger.info(
                "streaming query running: name=%s id=%s runId=%s",
                q.name, q.id, q.runId,
            )

        while True:
            if stop_requested["flag"]:
                _close_all()
                return 0
            any_active = False
            for q in qs:
                if q.isActive:
                    any_active = True
                    continue
                exc = q.exception()
                if exc is not None:
                    return _fail(exc)
            if not any_active:
                logger.info("all streaming queries stopped cleanly")
                return 0
            time.sleep(poll_interval)
    except KeyboardInterrupt:
        logger.info("interrupted — shutting down streams")
        _close_all()
        return 0
    except Exception as exc:  # noqa: BLE001 — parity: Try.run onFailure
        return _fail(exc)
