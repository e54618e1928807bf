"""bench.py outage behavior (round-3 verdict item 7).

The driver records bench.py's single JSON line in BENCH_rN.json. During
the 2026-08 axon relay outage the backend init crashed/hung, the script
died with a raw traceback, and the artifact recorded `parsed:null` —
indistinguishable from a perf regression. These tests simulate both
observed outage modes (raise and hang) and assert a structured,
parseable outage line.
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def test_probe_reports_init_exception():
    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    err = bench.probe_backend(timeout_s=5.0, _init_fn=boom)
    assert err is not None
    assert "UNAVAILABLE" in err


def test_probe_reports_hang():
    err = bench.probe_backend(timeout_s=0.2, _init_fn=lambda: time.sleep(30))
    assert err is not None
    assert "hung" in err


def test_probe_ok_when_backend_healthy():
    assert bench.probe_backend(timeout_s=5.0, _init_fn=lambda: None) is None


@pytest.mark.parametrize("mode,e2e,metric", [
    ("train", "0", "train_frustums_per_sec"),
    ("infer", "0", "infer_frustums_per_sec"),
    ("train", "1", "e2e_train_frustums_per_sec"),
])
def test_emit_unavailable_is_structured_json(mode, e2e, metric,
                                             monkeypatch, capsys):
    monkeypatch.setenv("T3D_E2E", e2e)
    line = bench.emit_unavailable(mode, "backend init hung > 240s")
    printed = capsys.readouterr().out.strip()
    assert printed == line
    parsed = json.loads(line)
    assert parsed["metric"] == metric
    assert parsed["value"] is None
    assert parsed["vs_baseline"] is None
    assert parsed["error"] == "backend-unavailable"
