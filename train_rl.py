#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/train_rl.py (same CLI surface as
the reference's train_rl.py)."""
from insenticap_model_tpu.cli.train_rl import main

if __name__ == "__main__":
    main()
