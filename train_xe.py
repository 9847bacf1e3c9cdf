#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/train_xe.py (same CLI surface as
the reference's train_xe.py)."""
from insenticap_model_tpu.cli.train_xe import main

if __name__ == "__main__":
    main()
