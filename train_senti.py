#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/train_senti.py (same CLI surface as
the reference's train_senti.py)."""
from insenticap_model_tpu.cli.train_senti import main

if __name__ == "__main__":
    main()
