"""Reproduce the ANCHOR.json metric table on the real TPU backend
(VERDICT r4 next #1).

ANCHOR.json pins the full 7-stage pipeline's metric table on the
committed synthetic corpus, but it has only ever been produced on the
CPU re-exec backend (tests/test_metrics_anchor.py runs under the
_cpu_reexec plugin). This tool runs the SAME pipeline
(tools/build_anchor.run_pipeline — train all five stages, decode, score
with the paper-table harness) on whatever backend the default
environment provides — on this host, the tunneled TPU chip — and
asserts the committed tolerances hold there too. It then rescores the
trained checkpoint a second time with ``--compute_dtype bfloat16``, the
measured TPU serving policy (utils/dtypes.policy_cast), so the
end-to-end metric table is also validated under serving numerics (at
anchor dims the pallas Winograd path is shape-ineligible —
ops/winograd.pallas_eligible needs cin%256==0 — so the bf16 leg
exercises the bf16 direct-conv/matmul numerics; Winograd vs direct
parity at production channels is pinned separately by
tests/test_winograd.py on-chip).

    python tools/anchor_tpu.py [--out ANCHOR_TPU.json] [--workdir DIR]

Writes ANCHOR_TPU.json: {backend, device, table, violations,
bf16: {table, violations}, ok}. Exit 0 only when the f32 table is
within the committed tolerances (the bf16 leg records its own verdict —
a bf16-only drift is reported, not fatal, since the anchor's contract
is the f32 pipeline; see VERDICT r4 next #1 "record and explain").

Match: /root/reference/README.md:29-36 (the table this anchor proxies).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import build_anchor


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ANCHOR_TPU.json"))
    ap.add_argument("--anchor", default=os.path.join(REPO, "ANCHOR.json"))
    ap.add_argument("--workdir", default="",
                    help="keep the pipeline tree here (default: temp)")
    ap.add_argument("--rescore_only", action="store_true",
                    help="skip the pipeline stages; score the existing "
                         "--workdir tree (resume after a scoring-side "
                         "failure without retraining)")
    a = ap.parse_args(argv)

    with open(a.anchor) as f:
        anchor = json.load(f)

    import jax
    backend = jax.default_backend()
    device = str(jax.devices()[0])
    print(f"====> backend={backend} device={device}")

    # ppl needs the native isclm
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)

    root = a.workdir or tempfile.mkdtemp(prefix="isc_anchor_tpu_")
    if a.rescore_only:
        table = build_anchor.score_checkpoint(root, seed=anchor["seed"])
    else:
        table = build_anchor.run_pipeline(root, seed=anchor["seed"],
                                          epochs=anchor["epochs"])
    violations = build_anchor.compare_tables(anchor["table"], table,
                                             anchor["tolerances"])

    print("====> rescoring with the bf16 serving policy")
    bf16_table = build_anchor.score_checkpoint(
        root, seed=anchor["seed"], tag="anchor_bf16",
        out="result/anchor_table_bf16.json", compute_dtype="bfloat16")
    bf16_violations = build_anchor.compare_tables(
        anchor["table"], bf16_table, anchor["tolerances"])

    record = {
        "backend": backend,
        "device": device,
        "anchor_seed": anchor["seed"],
        "tolerances": anchor["tolerances"],
        "table": table,
        "violations": violations,
        "bf16": {"table": bf16_table, "violations": bf16_violations},
        "ok": not violations,
    }
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"====> wrote {a.out} (pipeline tree: {root})")
    if violations:
        print("====> f32 TPU table OUTSIDE anchor tolerances:")
        for v in violations:
            print("      " + v)
    else:
        print("====> f32 TPU table within anchor tolerances")
    if bf16_violations:
        print("====> bf16 serving-policy deltas beyond tolerance "
              "(recorded, non-fatal):")
        for v in bf16_violations:
            print("      " + v)
    else:
        print("====> bf16 serving-policy table within anchor tolerances")
    sys.exit(0 if not violations else 1)


if __name__ == "__main__":
    main()
