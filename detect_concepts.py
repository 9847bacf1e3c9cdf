#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/detect_concepts.py (same CLI surface as
the reference's detect_concepts.py)."""
from insenticap_model_tpu.cli.detect_concepts import main

if __name__ == "__main__":
    main()
