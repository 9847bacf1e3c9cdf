"""Convert reference PyTorch checkpoints into this framework's param pytrees.

A reference user switching to this framework brings `.pth` checkpoints
(reference train_xe.py:241-254 format: {'model': state_dict, 'settings', ...});
these functions map each model's state_dict 1:1 onto our parameter trees.
Linear weights transpose [out,in] -> [in,out]; conv weights
[out,in,kh,kw] -> [kh,kw,in,out]; LSTM weights [4H,in] -> [in,4H].

Layer-name maps follow the reference module definitions:
  Captioner                 models/captioner.py:121-161
  ConceptDetector           models/concept_detector.py:10-18
  SentimentDetector         models/sentiment_detector.py:11-28
  SentenceSentimentClassifier models/sent_senti_cls.py:12-36
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    """Owning float32 copy of a state_dict tensor. np.asarray on a same-
    dtype torch tensor returns a VIEW of the live parameter storage, and
    jnp.asarray on the CPU backend can alias that buffer — without the copy,
    converted params would silently track subsequent in-place torch
    optimizer updates."""
    return np.array(t, np.float32, copy=True)


def _lin(sd, name):
    return {"w": jnp.asarray(_np(sd[name + ".weight"]).T),
            "b": jnp.asarray(_np(sd[name + ".bias"]))}


def _emb(sd, name):
    return {"table": jnp.asarray(_np(sd[name + ".weight"]))}


def _lstm(sd, prefix, suffix=""):
    return {
        "w_ih": jnp.asarray(_np(sd[f"{prefix}.weight_ih{suffix}"]).T),
        "w_hh": jnp.asarray(_np(sd[f"{prefix}.weight_hh{suffix}"]).T),
        "b_ih": jnp.asarray(_np(sd[f"{prefix}.bias_ih{suffix}"])),
        "b_hh": jnp.asarray(_np(sd[f"{prefix}.bias_hh{suffix}"])),
    }


def _conv(sd, name):
    p = {"w": jnp.asarray(_np(sd[name + ".weight"]).transpose(2, 3, 1, 0))}
    if name + ".bias" in sd:
        p["b"] = jnp.asarray(_np(sd[name + ".bias"]))
    return p


def captioner_from_torch(sd) -> Dict:
    return {
        "word_embed": _emb(sd, "word_embed.0"),
        "senti_label_embed": _emb(sd, "senti_label_embed.0"),
        "fc_embed": _lin(sd, "fc_embed.0"),
        "cpt2fc": _lin(sd, "cpt2fc.0"),
        "att_embed": _lin(sd, "att_embed.0"),
        "att2att": _lin(sd, "att2att.0"),
        "senti2att": _lin(sd, "senti2att.0"),
        "att_lstm": _lstm(sd, "att_lstm"),
        "lang_lstm": _lstm(sd, "lang_lstm"),
        "classifier": _lin(sd, "classifier"),
        "attention": {
            "cont": {"h2att": _lin(sd, "attention.cont_att.h2att"),
                     "att_alpha": _lin(sd, "attention.cont_att.att_alpha")},
            "senti": {"h2word": _lin(sd, "attention.senti_att.h2word"),
                      "label2word": _lin(sd, "attention.senti_att.label2word"),
                      "word_alpha": _lin(sd, "attention.senti_att.word_alpha")},
            "fuse": {"h2att": _lin(sd, "attention.h2att"),
                     "cont2att": _lin(sd, "attention.cont2att"),
                     "senti2att": _lin(sd, "attention.senti2att"),
                     "att_alpha": _lin(sd, "attention.att_alpha")},
        },
    }


def concept_detector_from_torch(sd) -> Dict:
    # Sequential(Linear, ReLU, Linear, ReLU, Dropout, Linear, Sigmoid)
    return {"fc1": _lin(sd, "output.0"), "fc2": _lin(sd, "output.2"),
            "fc3": _lin(sd, "output.5")}


def sentiment_detector_from_torch(sd, num_convs: int = 2,
                                  num_fcs: int = 2) -> Dict:
    return {
        "convs": [_conv(sd, f"convs.conv_{i}") for i in range(num_convs)],
        "senti_conv": _conv(sd, "senti_conv"),
        "fcs": [_lin(sd, f"output.{j}") for j in range(num_fcs)],
    }


def sentiment_detector_full_from_torch(sd, num_convs: int = 2) -> Dict:
    """"Full" variant (reference models/sentiment_detector_full.py:11-30;
    reference-dead code — see models/sentiment_detector_full.py)."""
    return {
        "convs": [_conv(sd, f"convs.conv_{i}") for i in range(num_convs)],
        "senti_conv": _conv(sd, "senti_conv"),
        "cls": _lin(sd, "cls"),
    }


def sent_senti_cls_from_torch(sd) -> Dict:
    return {
        "word_embed": _emb(sd, "word_embed.0"),
        "lstm": _lstm(sd, "rnn", "_l0"),
        "excitation1": _lin(sd, "excitation.0"),
        "excitation2": _lin(sd, "excitation.2"),
        "cls1": _lin(sd, "sent_senti_cls.0"),
        "cls2": _lin(sd, "sent_senti_cls.3"),
    }


def detector_from_torch(sd) -> Dict:
    """The RL-stage composite Detector checkpoint holds all three submodules
    under prefixes (reference train_rl.py:311-325)."""
    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}
    return {
        "captioner": captioner_from_torch(sub("captioner.")),
        "senti_detector": sentiment_detector_from_torch(sub("senti_detector.")),
        "sent_senti_cls": sent_senti_cls_from_torch(sub("sent_senti_cls.")),
    }
