"""Quality-metrics regression anchor (VERDICT r3 next #5): rebuild the
full 7-stage pipeline on the committed synthetic corpus and assert the
paper-table harness reproduces the committed ANCHOR.json within its
tolerances. Catches metric-affecting regressions (model math, data
layer, beam search, reward/metric scorers) without COCO; the real
paper-parity run (/root/reference/README.md:29-36) stays one data-drop
away."""
import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow  # full pipeline rebuild, minutes on CPU

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_metrics_anchor_reproduces(tmp_path):
    anchor_path = os.path.join(REPO, "ANCHOR.json")
    assert os.path.exists(anchor_path), \
        "ANCHOR.json missing — run tools/build_anchor.py"
    if os.path.join(REPO, "tools") not in sys.path:
        sys.path.insert(0, os.path.join(REPO, "tools"))
    from build_anchor import compare_tables, run_pipeline

    with open(anchor_path) as f:
        anchor = json.load(f)

    table = run_pipeline(str(tmp_path / "anchor"), seed=anchor["seed"],
                         epochs=anchor["epochs"])
    bad = compare_tables(anchor["table"], table, anchor["tolerances"])
    assert not bad, "metric drift vs ANCHOR.json:\n" + "\n".join(bad)

    # the anchor itself must witness a LEARNED pipeline, not noise: the
    # fact split carries scored rows and a live CIDEr-D signal
    q = anchor["table"]["splits"]["fact"]["quality"]
    assert q and any(row["CIDEr-D"] > 0 for row in q.values())
