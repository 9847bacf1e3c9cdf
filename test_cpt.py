#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/test_cpt.py (same CLI surface as
the reference's test_cpt.py)."""
from insenticap_model_tpu.cli.test_cpt import main

if __name__ == "__main__":
    main()
