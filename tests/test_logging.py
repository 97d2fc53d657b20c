"""Driver-side structured logging (logging_config.py)."""

import json
import logging


def test_json_lines_sink_and_stage_timer(tmp_path):
    from datasmith_spark.logging_config import configure, stage_timer

    path = str(tmp_path / "log.jsonl")
    log = configure(name="datasmith_test_json", json_path=path)
    assert configure(name="datasmith_test_json") is log  # idempotent
    assert len(log.handlers) == 2  # console + json (not doubled)

    with stage_timer(log, "demo", run_id="r1", parts=4):
        pass
    log.info("plain message", extra={"rows": 10})

    recs = [json.loads(line) for line in open(path)]
    assert len(recs) == 3
    start, done, plain = recs
    assert start["stage"] == "demo" and start["event"] == "start" and start["parts"] == 4
    assert done["event"] == "done" and done["wall_sec"] >= 0 and done["run_id"] == "r1"
    assert plain["rows"] == 10 and plain["level"] == "INFO"


def test_stage_timer_logs_errors(tmp_path):
    from datasmith_spark.logging_config import configure, stage_timer

    path = str(tmp_path / "err.jsonl")
    log = configure(name="datasmith_test_err", json_path=path)
    try:
        with stage_timer(log, "boom"):
            raise ValueError("expected")
    except ValueError:
        pass
    recs = [json.loads(line) for line in open(path)]
    assert recs[-1]["event"] == "error" and "expected" in recs[-1]["exc"]
    assert recs[-1]["level"] == "ERROR"


def test_pipeline_logger_is_quiet_by_default():
    # importing pipeline must not spam the root logger (propagate=False)
    from datasmith_spark.logging_config import configure

    log = configure()
    assert log.propagate is False
    assert isinstance(log, logging.Logger)


def test_reconfigure_attaches_late_json_sink(tmp_path):
    """A json_path that appears AFTER the first configure() (e.g. the env
    var set between runs) must attach the sink — and a changed path must
    swap the sink, not double it or keep writing to the old file."""
    from datasmith_spark.logging_config import configure

    log = configure(name="datasmith_test_late")
    assert len(log.handlers) == 1  # console only

    p1 = str(tmp_path / "late1.jsonl")
    assert configure(name="datasmith_test_late", json_path=p1) is log
    assert len(log.handlers) == 2
    log.info("first")

    p2 = str(tmp_path / "late2.jsonl")
    configure(name="datasmith_test_late", json_path=p2)
    assert len(log.handlers) == 2  # swapped, not accumulated
    log.info("second")

    import json as _json

    r1 = [_json.loads(x)["msg"] for x in open(p1)]
    r2 = [_json.loads(x)["msg"] for x in open(p2)]
    assert r1 == ["first"] and r2 == ["second"]

    # explicit level on a repeat call re-applies
    configure(name="datasmith_test_late", level="warning")
    assert log.level == 30
