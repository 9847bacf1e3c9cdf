"""Shared scaffolding for the torch-CPU reference benchmarks
(bench_reference.py at the repo root, tools/bench_reference_train.py,
tools/bench_reference_rl.py): one copy of the reference's production
settings (reference opts.py:79-96), vocab construction, the elementwise
grad clamp (reference train_*.py clip_gradient), and synthetic caption
batches — so a shape change cannot silently diverge across baselines.
"""
import numpy as np

REF = "/root/reference"
VOCAB = 10000
NUM_SENTIS = 10
T = 16
SENTI_CATS = ["positive", "negative", "neutral"]
SETTINGS = {  # reference opts.py:79-96
    "word_emb_dim": 512, "fc_feat_dim": 2048, "att_feat_dim": 2048,
    "feat_emb_dim": 512, "dropout_p": 0.5, "rnn_hid_dim": 512,
    "att_hid_dim": 512, "concept_mid_him": 1024,
    "sentiment_convs_num": 2, "sentiment_fcs_num": 2,
}


def add_ref_path():
    import sys
    if REF not in sys.path:
        sys.path.insert(0, REF)


def idx2word():
    return ["<PAD>", "<UNK>", "<SOS>", "<EOS>"] + [
        f"w{i}" for i in range(VOCAB - 4)]


def clip_gradient(optimizer, grad_clip=0.1):
    """Reference train_*.py clip_gradient: elementwise clamp."""
    for group in optimizer.param_groups:
        for param in group["params"]:
            if param.grad is not None:
                param.grad.data.clamp_(-grad_clip, grad_clip)


def synth_caps(g, bs, min_len=6):
    """Padded [bs, T+1] int64 caption batch (SOS ... EOS) + lengths."""
    caps = np.zeros((bs, T + 1), np.int64)
    lengths = []
    for i in range(bs):
        L = int(g.integers(min_len, T + 1))
        caps[i, 0], caps[i, 1:L], caps[i, L] = (
            2, g.integers(4, VOCAB, size=L - 1), 3)
        lengths.append(L)
    return caps, lengths
