#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/eval_ppl.py (same CLI surface as
the reference's eval_ppl.py)."""
from insenticap_model_tpu.cli.eval_ppl import main

if __name__ == "__main__":
    main()
