"""utils/profiling.py: the §5 tracing/metrics subsystem (StepTimer jsonl
records, EMA rate, sink completion hook, maybe_trace no-op path)."""
import json

import jax.numpy as jnp

from insenticap_model_tpu.utils import profiling


def test_step_timer_writes_jsonl_and_ema(tmp_path):
    log = tmp_path / "metrics.jsonl"
    t = profiling.StepTimer(log_path=str(log), ema=0.5, items_per_step=10)
    for i in range(3):
        with t.step(i):
            t.sink({"loss": jnp.ones((4,)), "aux": jnp.zeros((2, 2))})
    recs = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["step"] for r in recs] == [0, 1, 2]
    for r in recs:
        assert r["step_time_s"] > 0
        assert r["items_per_s"] > 0
        assert r["items_per_s_ema"] > 0
    assert t.rate_ema is not None and t.rate_ema > 0


def test_step_timer_items_override_and_no_log():
    t = profiling.StepTimer()          # no log path, no items -> no rate
    with t.step(0):
        pass
    assert t.rate_ema is None
    with t.step(1, items=5):
        t.sink(jnp.arange(3))
    assert t.rate_ema is not None


def test_sink_returns_value_and_handles_non_arrays():
    t = profiling.StepTimer()
    val = {"a": 1, "b": "x"}           # no device leaves
    assert t.sink(val) is val
    assert t._sink_val is None


def test_maybe_trace_disabled_is_noop(tmp_path):
    with profiling.maybe_trace(None):
        pass
    with profiling.maybe_trace(str(tmp_path), enabled=False):
        pass


def test_maybe_trace_enabled_writes_trace(tmp_path):
    with profiling.maybe_trace(str(tmp_path / "tr")):
        jnp.ones((8,)).sum().block_until_ready()
    # jax.profiler writes a plugins/profile tree under the trace dir
    assert any((tmp_path / "tr").rglob("*"))
