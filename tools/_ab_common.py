"""Shared ABBA harness for the env-knob bench_train A/B tools.

One definition of the subprocess invocation, output parsing, ABBA loop,
min-reduction, and verdict print, so ab_scan_unroll / ab_ciderd_merge /
ab_rl_detector cannot silently diverge (and a bench_train crash leaves
its stderr in the error instead of burning a chip-queue slot with no
diagnostic).
"""
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_bench_train(env_overrides, xe_bs, rl_bs, timeout=3600):
    """One tools/bench_train.py subprocess under the given env knobs;
    returns {"XE": ms, "RL": ms}. Raises with BOTH stdout and stderr on
    a nonzero exit or unparseable output."""
    env = dict(os.environ,
               **{k: str(v) for k, v in env_overrides.items()})
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         str(xe_bs), str(rl_bs)],
        env=env, capture_output=True, text=True, timeout=timeout)
    found = re.findall(r"(XE|RL) step bs=\d+: ([\d.]+) ms", proc.stdout)
    d = {k: float(v) for k, v in found}
    if proc.returncode != 0 or not d:
        raise RuntimeError(
            f"bench_train failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout}\n"
            f"--- stderr ---\n{proc.stderr}")
    return d


def abba(env_name, candidate, baseline, xe_bs, rl_bs, metrics=("RL",),
         label=None):
    """Candidate/baseline/baseline/candidate over one env knob (ABBA
    absorbs monotonic drift on the shared chip). Prints per-run lines
    and a WIN/no-win verdict per metric at the repo's >=3% accept bar;
    returns {metric: (candidate_ms, baseline_ms)} (min over the two
    legs each)."""
    label = label or env_name
    runs = []
    for v in (candidate, baseline, baseline, candidate):
        r = run_bench_train({env_name: v}, xe_bs, rl_bs)
        runs.append((v, r))
        print(f"{label}={v}: " + ", ".join(
            f"{k} {r[k]:.2f} ms" for k in metrics if k in r), flush=True)
    out = {}
    for k in metrics:
        a = min(r[k] for v, r in runs if v == candidate)
        b = min(r[k] for v, r in runs if v == baseline)
        out[k] = (a, b)
        print(f"{k}: {label}={candidate} {a:.2f} ms vs {label}={baseline} "
              f"{b:.2f} ms -> {'WIN' if a < b * 0.97 else 'no win'} "
              f"({(b / a - 1) * 100:+.1f}%)", flush=True)
    return out
