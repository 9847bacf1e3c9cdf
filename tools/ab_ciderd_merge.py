"""A/B the merged-[2bs] CIDEr-D scoring against the two-call form.

`ops/ciderd_device.self_critical_reward` can score both rollouts in one
cider_d call over [2bs] rows (ISC_CIDERD_MERGED=1, default) or one call
per rollout (=0, the pre-r4 form). The scorer is a composition of many
tiny [N,T,T] VPU ops, so the merged program halves the op count; the
train-step ablation bounded the whole CIDEr stage at ~2.2 ms of the
22.8 ms RL step (tools/ablate_train.py, opacity-corrected re-run), so
the ceiling here is ~+10%.

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
import sys

from _ab_common import abba


def main():
    xe_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rl_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    abba("ISC_CIDERD_MERGED", 1, 0, xe_bs, rl_bs,
         metrics=("RL",), label="merged")


if __name__ == "__main__":
    main()
