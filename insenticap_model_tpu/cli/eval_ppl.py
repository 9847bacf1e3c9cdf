"""Perplexity of generated captions under per-sentiment trigram LMs
(reference eval_ppl.py, which shells out to SRILM's ``ngram -ppl``).

Scoring backend resolution order:
  1. SRILM's ``ngram`` binary if on PATH (byte-compatible with the
     reference toolchain);
  2. the in-tree C++ trigram tool ``isclm`` (native/isclm) which reads the
     same ARPA-format .sri files and reports SRILM-compatible ppl
     (excludes OOVs and counts </s>, like ngram -ppl).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

SENTIS = ["positive", "negative", "neutral"]
LM_PATH = "./data/captions/%s/%s/lm/%s_w.sri"


def _isclm_binary():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(here, "..", "native", "build", "isclm"),
                 os.path.join(here, "native", "build", "isclm"),
                 shutil.which("isclm")):
        if cand and os.path.exists(cand):
            return cand
    return None


def _run_scorer(cmd, text_file: str, lm_file: str) -> float:
    """Run an LM scorer and parse 'ppl= <value>'. Failures raise (missing
    text/LM file, scorer crash, unparseable output) — silently returning
    0.0 would deflate the printed per-sentiment scores and their sum."""
    for f in (text_file, lm_file):
        if not os.path.exists(f):
            raise FileNotFoundError(f"ppl scorer input missing: {f}")
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd[0]} failed (rc={r.returncode}): "
                           f"{r.stderr.strip() or r.stdout.strip()}")
    out = r.stdout.split()
    try:
        return float(out[out.index("ppl=") + 1])
    except (ValueError, IndexError) as e:
        raise RuntimeError(
            f"could not parse ppl from {cmd[0]} output: "
            f"{r.stdout.strip()!r}") from e


def _ppl_via_ngram(text_file: str, lm_file: str) -> float:
    return _run_scorer(["ngram", "-ppl", text_file, "-lm", lm_file],
                       text_file, lm_file)


def _ppl_via_isclm(binary: str, text_file: str, lm_file: str) -> float:
    return _run_scorer([binary, "ppl", lm_file, text_file],
                       text_file, lm_file)


def compute_ppl(captions_file_prefix: str, data_type: str) -> dict:
    dataset_name = "flickr30k" if "flickr30k" in captions_file_prefix \
        else "coco"
    corpus_type = "full" if "full" in captions_file_prefix else "part"

    use_ngram = shutil.which("ngram") is not None
    isclm = None if use_ngram else _isclm_binary()
    if not use_ngram and isclm is None:
        raise RuntimeError(
            "no LM scorer: neither SRILM 'ngram' nor the in-tree 'isclm' "
            "binary is available (build with `make -C native`)")

    scores = {}
    for senti in SENTIS:
        text = f"{captions_file_prefix}_{senti}_{data_type}_w.txt"
        lm = LM_PATH % (dataset_name, corpus_type, senti)
        scores[senti] = (_ppl_via_ngram(text, lm) if use_ngram
                         else _ppl_via_isclm(isclm, text, lm))
    print("ppl scores:", scores)
    print("ppl scores sum:", sum(scores.values()))
    return scores


def main(argv=None):
    args = argv if argv is not None else sys.argv[1:]
    compute_ppl(args[0], args[1])


if __name__ == "__main__":
    main()
