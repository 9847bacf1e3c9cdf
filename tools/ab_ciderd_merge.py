"""A/B the merged-[2bs] CIDEr-D scoring against the two-call form.

`ops/ciderd_device.self_critical_reward` can score both rollouts in one
cider_d call over [2bs] rows (ISC_CIDERD_MERGED=1, default) or one call
per rollout (=0, the pre-r4 form). The scorer is a composition of many
tiny [N,T,T] VPU ops, so the merged program halves the op count; the
train-step ablation bounded the whole CIDEr stage at ~2.5 ms of the
22.9 ms RL step (tools/ablate_train.py), so the ceiling here is ~+11%.

Runs tools/bench_train.py in subprocesses with the knob alternating
merged/split/split/merged (ABBA absorbs monotonic drift on the shared
chip), parses the RL ms-per-step line, and prints the verdict.

    python tools/ab_ciderd_merge.py [xe_bs=128] [rl_bs=40]

Run on the real chip (default env). Chip verdict (r4): merged
22.70/22.80 ms vs split 22.90/23.10 — +0.9%, below the repo's 3%
accept bar for added mechanisms, but kept as the default because the
merged form is the natural single-program composition (it is also how
the reference scores: one compute_score call over sample+greedy,
self_critical/utils.py:68-74) with row-identical numerics; see
DESIGN.md round-4 item 10.
"""
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(merged: int, xe_bs: int, rl_bs: int) -> float:
    env = dict(os.environ, ISC_CIDERD_MERGED=str(merged))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_train.py"),
         str(xe_bs), str(rl_bs)],
        env=env, capture_output=True, text=True, timeout=3600).stdout
    m = re.search(r"RL step bs=\d+: ([\d.]+) ms", out)
    if not m:
        raise RuntimeError(f"unparseable bench_train output:\n{out}")
    return float(m.group(1))


def main():
    xe_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rl_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    runs = []
    for merged in (1, 0, 0, 1):                  # ABBA
        ms = run_one(merged, xe_bs, rl_bs)
        runs.append((merged, ms))
        print(f"merged={merged}: RL {ms:.2f} ms", flush=True)
    a = min(ms for m, ms in runs if m == 1)      # merged
    b = min(ms for m, ms in runs if m == 0)      # split
    print(f"RL: merged {a:.2f} ms vs split {b:.2f} ms -> "
          f"{'WIN' if a < b * 0.97 else 'no win'} ({(b / a - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
