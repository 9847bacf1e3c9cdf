"""A/B the frozen RL sentiment detector: f32 direct convs vs bf16
pallas Winograd (the serving-grade stack).

The train-step ablation bounded the detector at 3.34 ms of the 23.6 ms
RL fact step (14.1% — tools/ablate_train.py), the single largest
non-differentiated stage. The detector is frozen and label-only inside
the step (its sample runs OUTSIDE the differentiated closure), so the
same argument that put serving on the bf16 F(5x5,3x3) Winograd stack
applies; steps.py routes the detector input by the frozen params'
staged dtype, and ISC_RL_DETECTOR_BF16=1 makes tools/bench_train.py
stage them bf16.

Runs bench_train in subprocesses with the knob alternating
bf16/f32/f32/bf16 (ABBA absorbs monotonic drift on the shared chip),
parses the RL line, prints the verdict. Numerics caveat measured
separately: bf16 can flip borderline argmax/threshold labels —
tests/test_training_steps.py::test_rl_detector_bf16_labels quantifies
it on a fixed batch.

    python tools/ab_rl_detector.py [xe_bs=128] [rl_bs=40]

Run on the real chip (default env). Chip verdict (r4): REJECTED as the
default — bf16 23.40/23.10 ms vs f32 23.30/22.80 (ABBA), i.e. -1.3%
e2e. The Winograd stack that wins +26% on the bs=384 serving batch
LOSES at rl_bs=40 inside the train program: the f32->bf16 cast of the
[bs,14,14,2048] atts adds an HBM pass, and the Mosaic custom call
fences XLA fusion mid-program (the pallas-in-scan lesson again). The
knob stays (--rl_detector_dtype bf16) for bigger-batch RL configs; see
DESIGN.md round-4 item 11.
"""
import sys

from _ab_common import abba


def main():
    xe_bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rl_bs = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    abba("ISC_RL_DETECTOR_BF16", 1, 0, xe_bs, rl_bs,
         metrics=("RL",), label="detector_bf16")


if __name__ == "__main__":
    main()
