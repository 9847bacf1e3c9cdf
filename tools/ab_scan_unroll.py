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
import sys

from _ab_common import abba


def main():
    unroll_b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    xe_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rl_bs = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    abba("ISC_SCAN_UNROLL", unroll_b, 1, xe_bs, rl_bs,
         metrics=("XE", "RL"), label="unroll")


if __name__ == "__main__":
    main()
