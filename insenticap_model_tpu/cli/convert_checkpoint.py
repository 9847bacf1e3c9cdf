"""Convert reference PyTorch checkpoints (.pth) into this framework's
checkpoint format, preserving the metadata-equality contract.

    python convert_checkpoint.py <kind> <in.pth> <out.ckpt>

kind: captioner | concept | sentiment | sent_senti_cls | detector | resnet101

Conversion functions live in convert.py (exact-parity tested against the
reference modules in tests/test_reference_parity.py).
"""
from __future__ import annotations

import sys

import torch

from .. import convert
from ..training import checkpoint as ckpt


def run(kind: str, in_path: str, out_path: str) -> None:
    blob = torch.load(in_path, map_location="cpu")
    if kind == "resnet101":
        from ..models import encoder as enc
        params = enc.convert_torch_state_dict(blob)
        ckpt.save(out_path, params, None, {"kind": "resnet101",
                                           "epoch": -1})
        print(f"wrote {out_path}")
        return

    sd = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    fn = {
        "captioner": convert.captioner_from_torch,
        "concept": convert.concept_detector_from_torch,
        "sentiment": convert.sentiment_detector_from_torch,
        "sent_senti_cls": convert.sent_senti_cls_from_torch,
        "detector": convert.detector_from_torch,
    }[kind]
    params = fn(sd)
    metadata = {"kind": kind, "epoch": blob.get("epoch", -1)}
    for key in ("settings", "idx2word", "idx2concept",
                "sentiment_categories", "dataset_name", "corpus_type",
                "max_seq_len"):
        if isinstance(blob, dict) and key in blob:
            metadata[key] = blob[key]
    ckpt.save(out_path, params, None, metadata)
    print(f"wrote {out_path} (epoch {metadata['epoch']})")


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    if len(args) != 3:
        print(__doc__)
        sys.exit(2)
    run(args[0], args[1], args[2])


if __name__ == "__main__":
    main()
