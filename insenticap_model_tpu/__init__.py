"""insenticap_model_tpu — a TPU-native (JAX/XLA/Pallas) framework for
sentiment-controllable image captioning, with the full capabilities of the
reference PyTorch implementation ezeli/InSentiCap_model (ICME 2021,
"Image Captioning with Inherent Sentiment").

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  config    — two-tier dataclass config (run opts + architecture settings)
  vocab     — vocabulary / tokenization with reference-compatible semantics
  nn        — functional NN substrate (explicit param pytrees, torch-layout
              compatible so reference checkpoints convert 1:1)
  models    — captioner (fused scan decode cell, batched beam search),
              concept / image-sentiment / sentence-sentiment heads,
              patched ResNet-101 encoder
  ops       — decode-time ops: batched beam search, sampling, adaptive pool,
              on-device CIDEr-D
  rewards   — SCST rewards: CIDEr-D (host parity + device), BLEU, cls reward
  data      — feature stores (HDF5 + native mmap store), fixed-shape batching
  parallel  — jax.sharding mesh utilities + data-parallel train steps
  training  — optimizers, checkpointing, the five training stages
  cli       — argparse surface mirroring the reference's opts.py
"""

__version__ = "0.1.0"
