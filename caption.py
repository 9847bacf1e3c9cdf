#!/usr/bin/env python
"""Entry point: see insenticap_model_tpu/cli/caption.py (one-shot image ->
sentiment-controlled caption; composes the full inference DAG)."""
from insenticap_model_tpu.cli.caption import main

if __name__ == "__main__":
    main()
