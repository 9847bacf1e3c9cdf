"""Measure the REFERENCE serving path (torch, CPU) for an honest
`vs_baseline` denominator in bench.py.

Times the reference's full per-image decode — SentimentDetector.sample +
Captioner.sample beam search (the Detector.sample path,
/root/reference/models/decoder.py:182-192) — at production shapes
(vocab 10k, the opts.py:79-96 settings, beam=3, max_seq_len=16) with random
weights on torch CPU, mirroring how bench.py measures our serving path.

The reference published no throughput numbers (BASELINE.md), so the
measured torch-CPU rate is the only defensible baseline available in this
environment; an A100 would be faster, but the reference loop is dominated
by per-candidate Python overhead (one forward per live beam candidate per
step, captioner.py:380-411), not device FLOPs.

Usage: python bench_reference.py [n_images]  -> one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tools"))
from ref_common import (NUM_SENTIS, SENTI_CATS, SETTINGS,  # noqa: E402
                        VOCAB, add_ref_path)
from ref_common import idx2word as _idx2word  # noqa: E402

add_ref_path()

import numpy as np  # noqa: E402
import torch  # noqa: E402


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from models.captioner import Captioner
    from models.sentiment_detector import SentimentDetector

    torch.manual_seed(0)
    captioner = Captioner(_idx2word(), SENTI_CATS, SETTINGS).eval()
    senti_det = SentimentDetector(SENTI_CATS, SETTINGS).eval()

    g = np.random.default_rng(0)
    fc = torch.from_numpy(
        g.normal(size=(n_images, SETTINGS["fc_feat_dim"])).astype(
            np.float32))
    att = torch.from_numpy(
        g.normal(size=(n_images, 14, 14,
                       SETTINGS["att_feat_dim"])).astype(np.float32))
    sentis = torch.from_numpy(
        g.integers(4, VOCAB, size=(n_images, NUM_SENTIS)).astype(np.int64))

    with torch.no_grad():
        # warmup (one image, not timed)
        labels, _, _, _ = senti_det.sample(att[:1], 0.7)
        captioner.sample(fc[0], att[0], sentis[0], labels[:1],
                         beam_size=3, decoding_constraint=1, max_seq_len=16)

        t0 = time.perf_counter()
        for i in range(n_images):
            a = att[i:i + 1]
            labels, _, _, _ = senti_det.sample(a, 0.7)
            captioner.sample(fc[i], att[i], sentis[i], labels,
                             beam_size=3, decoding_constraint=1,
                             max_seq_len=16)
        dt = time.perf_counter() - t0

    result = {
        "metric": "reference_captions_per_sec_torch_cpu_beam3",
        "value": round(n_images / dt, 3),
        "unit": "captions/s",
        "n_images": n_images,
        "torch_threads": torch.get_num_threads(),
        "note": "reference Detector.sample path, random weights, "
                "production shapes; measured on this host's CPU",
    }
    print(json.dumps(result))
    import os
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "REF_BENCH.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
