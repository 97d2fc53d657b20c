"""Driver-side structured logging for pipeline runs.

Ancestry: the reference ships a dedicated logging setup
(/root/reference/src/datasmith/logging_config.py — console formatting, level
control, per-module loggers). The Spark rebuild's primary observability
surface is cluster-side — the lineage/metrics side tables written by
run_pipeline — but the DRIVER still needs a log of what each run decided
(parts resumed vs recomputed, stage wall times, deletions). This module
provides that: a console handler plus an optional JSON-lines file sink
whose records are machine-parseable (one object per line with typed extra
fields), and a stage_timer context manager used by run_pipeline.

Configuration is idempotent per logger name (safe under repeated
run_pipeline calls in one driver). Env knobs:
  SPARK_GRAFT_LOG_LEVEL  (default INFO)
  SPARK_GRAFT_LOG_JSON   (path; JSON-lines sink enabled when set)
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from contextlib import contextmanager

# extra-record fields forwarded into JSON records (everything else on the
# LogRecord is logging-internal)
_EXTRA_FIELDS = (
    "stage", "wall_sec", "rows", "parts", "run_id", "out_dir", "event",
)


class JsonLinesFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        d = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        for f in _EXTRA_FIELDS:
            v = record.__dict__.get(f)
            if v is not None:
                d[f] = v
        if record.exc_info:
            d["exc"] = self.formatException(record.exc_info)
        return json.dumps(d)


def _attach_json_sink(logger: logging.Logger, json_path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(json_path)), exist_ok=True)
    fh = logging.FileHandler(json_path)
    fh.setFormatter(JsonLinesFormatter())
    fh._datasmith_json = True  # type: ignore[attr-defined]
    logger.addHandler(fh)


def configure(
    name: str = "datasmith_spark",
    level: str | None = None,
    json_path: str | None = None,
) -> logging.Logger:
    """Logger setup: console + optional JSON-lines file sink.

    Idempotent per logger name, but repeat calls RECONCILE changed config
    instead of silently ignoring it: an explicit `level` re-applies, and a
    json_path (argument or SPARK_GRAFT_LOG_JSON set after the first
    run_pipeline of the session) attaches the JSON sink — swapping out a
    previously-attached sink that points at a different file."""
    logger = logging.getLogger(name)
    json_path = json_path or os.environ.get("SPARK_GRAFT_LOG_JSON")
    if getattr(logger, "_datasmith_configured", False):
        if level is not None:
            logger.setLevel(level.upper())
        if json_path:
            want = os.path.abspath(json_path)
            stale = [
                h for h in logger.handlers
                if getattr(h, "_datasmith_json", False)
                and os.path.abspath(getattr(h, "baseFilename", "")) != want
            ]
            for h in stale:
                logger.removeHandler(h)
                h.close()
            if not any(
                getattr(h, "_datasmith_json", False)
                and os.path.abspath(getattr(h, "baseFilename", "")) == want
                for h in logger.handlers
            ):
                _attach_json_sink(logger, json_path)
        return logger
    logger.setLevel((level or os.environ.get("SPARK_GRAFT_LOG_LEVEL", "INFO")).upper())
    logger.propagate = False  # keep out of Spark's root-logger noise

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)-7s %(name)s: %(message)s")
    )
    logger.addHandler(console)

    if json_path:
        _attach_json_sink(logger, json_path)

    logger._datasmith_configured = True  # type: ignore[attr-defined]
    return logger


@contextmanager
def stage_timer(logger: logging.Logger, stage: str, **fields):
    """Log a stage's start and wall time (fields land in the JSON record)."""
    t0 = time.time()
    logger.info("start %s", stage, extra={"stage": stage, "event": "start", **fields})
    try:
        yield
    except Exception:
        logger.exception(
            "failed %s", stage,
            extra={"stage": stage, "event": "error", "wall_sec": round(time.time() - t0, 3)},
        )
        raise
    else:
        logger.info(
            "done %s", stage,
            extra={"stage": stage, "event": "done",
                   "wall_sec": round(time.time() - t0, 3), **fields},
        )
