"""A/B the ISC_SCAN_UNROLL knob on the training scans (models/captioner.py).

Runs tools/bench_train.py in subprocesses with ISC_SCAN_UNROLL alternating
in an A/B/B/A pattern (absorbs monotonic drift on the shared chip), parses
the XE/RL ms-per-step lines, and prints a comparison table. The knob
unrolls the teacher-forced and RL-rollout ``lax.scan`` bodies so XLA can
fuse across adjacent timesteps — the same cross-step-fusion axis that made
the fused-topk pallas kernel LOSE end-to-end (DESIGN.md dead-end table),
now pointed the opposite direction. Serving is unaffected (its decode loop
is the early-exit while_loop, which cannot unroll).

    python tools/ab_scan_unroll.py [unroll_b=4] [xe_bs=128] [rl_bs=40]

Run on the real chip (default env). Accept the knob as default only on a
>=3% end-to-end win, per the repo's measured-rejection discipline.
"""
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(unroll: int, xe_bs: int, rl_bs: int):
    env = dict(os.environ, ISC_SCAN_UNROLL=str(unroll))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         str(xe_bs), str(rl_bs)],
        env=env, capture_output=True, text=True, timeout=3600).stdout
    ms = re.findall(r"(XE|RL) step bs=\d+: ([\d.]+) ms", out)
    d = {k: float(v) for k, v in ms}
    if set(d) != {"XE", "RL"}:
        raise RuntimeError(f"unparseable bench_train output:\n{out}")
    return d


def main():
    unroll_b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    xe_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rl_bs = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    plan = [1, unroll_b, unroll_b, 1]            # ABBA
    runs = []
    for u in plan:
        r = run_one(u, xe_bs, rl_bs)
        runs.append((u, r))
        print(f"unroll={u}: XE {r['XE']:.1f} ms, RL {r['RL']:.1f} ms",
              flush=True)
    for k in ("XE", "RL"):
        a = min(r[k] for u, r in runs if u == 1)
        b = min(r[k] for u, r in runs if u == unroll_b)
        print(f"{k}: unroll=1 {a:.1f} ms vs unroll={unroll_b} {b:.1f} ms "
              f"-> {'WIN' if b < a * 0.97 else 'no win'} "
              f"({(a / b - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
