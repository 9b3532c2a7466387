"""Structured tracing subsystem."""

import numpy as np
import pytest

from audian_tpu.utils import trace
from audian_tpu.data import Data, default_traces, wavio


@pytest.fixture(autouse=True)
def tracing():
    trace.clear()
    trace.enable(log=False)
    yield
    trace.disable()
    trace.clear()


def test_event_recording_and_summary():
    trace.trace_event("x", a=1)
    with trace.timed("y", b=2):
        pass
    evs = trace.events()
    assert [e["kind"] for e in evs] == ["x", "y"]
    assert "ms" in trace.events("y")[0]
    s = trace.summary()
    assert s["x"]["count"] == 1 and "ms" in s["y"]


def test_disabled_is_noop():
    trace.disable()
    trace.trace_event("z")
    assert trace.events() == []


def test_pipeline_emits_events(tmp_path, rng):
    x = 0.1 * rng.standard_normal((20000, 1))
    p = tmp_path / "t.wav"
    wavio.write_audio(p, x, 20000.0, encoding="FLOAT")
    d = Data(p)
    for n in default_traces():
        d.add_trace(n)
    d.open()
    d.update_times(0.0, 0.5)
    kinds = {e["kind"] for e in trace.events()}
    assert "loader.read" in kinds
    assert "graph.run" in kinds
    assert "graph.build" in kinds
    d.close()
