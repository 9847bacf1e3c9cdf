#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/train_cpt.py (same CLI surface as
the reference's train_cpt.py)."""
from insenticap_model_tpu.cli.train_cpt import main

if __name__ == "__main__":
    main()
