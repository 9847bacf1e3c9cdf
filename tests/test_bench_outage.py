"""bench.py outage contract: the driver must ALWAYS get one parseable
labeled JSON line, never rc=124 with empty output (the round-3 failure
mode — VERDICT r3 weak #1). Two failure paths are pinned:

- init-wait expiry (backend never answers) -> exit 2,
  error="backend_unavailable_after_wait";
- total-budget expiry (backend answered, then the run wedged or overran)
  -> exit 3, error="bench_total_budget_expired" via the daemon-Timer
  watchdog + os._exit (bench.py:_arm_watchdog).

Both are exercised as real subprocesses of the real bench.py so the
exit-code + stdout contract is what the driver actually observes.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two real bench.py subprocesses, ~1 min

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout=300):
    env = dict(os.environ)
    env.update(env_extra)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    return p


def _last_json_line(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert lines, "bench.py printed nothing to stdout"
    return json.loads(lines[-1])


def test_backend_unavailable_prints_failure_record():
    # A bogus platform makes every `jax.devices()` probe subprocess fail;
    # with a ~1 s init budget the wait expires after the first probe.
    p = _run_bench({"JAX_PLATFORMS": "definitely_not_a_platform",
                    "ISC_BENCH_INIT_WAIT_S": "1"})
    assert p.returncode == 2, (p.returncode, p.stdout, p.stderr[-500:])
    rec = _last_json_line(p.stdout)
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert rec["error"] == "backend_unavailable_after_wait"
    assert rec["metric"] == "senticap_captions_per_sec_per_chip_beam3"


def test_total_budget_expiry_prints_failure_record():
    # The probe succeeds (CPU backend), then a ~0.5 s total budget expires
    # long before the serving-path compile finishes — the watchdog must
    # print the labeled record and force-exit 3 even if the main thread
    # is wedged inside a device call.
    # Pin the CPU backend + scrubbed PYTHONPATH explicitly (advisor r4):
    # under pytest the _cpu_reexec plugin provides them, but run any other
    # way the probe would go through the axon tunnel and this test would
    # hang on the link instead of exercising the watchdog.
    p = _run_bench({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "",
                    "ISC_BENCH_INIT_WAIT_S": "60",
                    "ISC_BENCH_TOTAL_BUDGET_S": "0.5"})
    assert p.returncode == 3, (p.returncode, p.stdout, p.stderr[-500:])
    rec = _last_json_line(p.stdout)
    assert rec["value"] is None
    assert rec["error"] == "bench_total_budget_expired"
    assert rec["waited_s"] >= 0.5
