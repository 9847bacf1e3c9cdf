#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/eval_cls_rnn.py (same CLI surface as
the reference's eval_cls_rnn.py)."""
from insenticap_model_tpu.cli.eval_cls_rnn import main

if __name__ == "__main__":
    main()
