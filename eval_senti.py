#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/eval_senti.py (same CLI surface as
the reference's eval_senti.py)."""
from insenticap_model_tpu.cli.eval_senti import main

if __name__ == "__main__":
    main()
