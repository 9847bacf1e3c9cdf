"""Patched ResNet-101 feature extractor (reference models/encoder.py:9-55).

The reference patches torchvision ResNet-101 in two ways (encoder.py:12-15):
  * maxpool: kernel 3, stride 2, padding 0, ceil_mode=True;
  * layers 2-4 first block: the stride-2 moves from conv2 back to conv1
    (ResNet v1 placement rather than torchvision's v1.5).

This is an inference-only extractor (the reference never trains it), so
BatchNorm folds to per-channel scale/offset from running stats. NHWC layout
throughout (TPU-native). Arbitrary input sizes are supported shape-statically:
ceil-mode padding and the adaptive 14x14 pool are computed per compiled shape.

``forward`` returns (fc [2048], att [14, 14, 2048]) exactly like the
reference (encoder.py:39-55): fc is the global spatial mean, att an adaptive
average pool of the final conv map.
"""
from __future__ import annotations

import math
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adaptive_pool import adaptive_avg_pool2d

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# ResNet-101: blocks per layer, mid-channels per layer
LAYERS = (3, 4, 23, 3)
MIDS = (64, 128, 256, 512)
EXPANSION = 4

# A/B knob: run forward_raw_batch's conv1 as a space-to-depth 4x4/s1
# conv (see _stem_conv_s2d). Bit-compatible rewrite of the same
# arithmetic; default follows the measured verdict
# (tools/profile_encoder.py s2d — DESIGN.md round 4).
_S2D_STEM = int(os.environ.get("ISC_S2D_STEM", "0"))


def _conv_init(key, kh, kw, cin, cout):
    # torchvision: kaiming_normal_(fan_out, relu)
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * std}


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_params(key) -> Dict:
    """Random init (for tests; real use converts resnet101.pth)."""
    keys = iter(jax.random.split(key, 512))
    p: Dict = {
        "conv1": _conv_init(next(keys), 7, 7, 3, 64),
        "bn1": _bn_init(64),
        "layers": [],
    }
    cin = 64
    for li, (nblocks, mid) in enumerate(zip(LAYERS, MIDS)):
        layer: List[Dict] = []
        cout = mid * EXPANSION
        for b in range(nblocks):
            blk = {
                "conv1": _conv_init(next(keys), 1, 1, cin, mid),
                "bn1": _bn_init(mid),
                "conv2": _conv_init(next(keys), 3, 3, mid, mid),
                "bn2": _bn_init(mid),
                "conv3": _conv_init(next(keys), 1, 1, mid, cout),
                "bn3": _bn_init(cout),
            }
            if b == 0 and (li > 0 or cin != cout):
                blk["downsample"] = {
                    "conv": _conv_init(next(keys), 1, 1, cin, cout),
                    "bn": _bn_init(cout),
                }
            layer.append(blk)
            cin = cout
        p["layers"].append(layer)
    return p


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["scale"] + p["bias"]


def _conv(p, x, stride, pad):
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_kernel(w):
    """conv1's [7,7,cin,cout] kernel re-indexed for space-to-depth pixels:
    w2[ki,kj,(a*2+b)*cin+c] = w[2ki+a, 2kj+b, c] (zero where the source
    tap 2k+a exceeds 6). Pure reshape/transpose on a zero-padded [8,8]
    kernel, so it constant-folds at compile time when w is a closure
    constant."""
    kh, kw, cin, cout = w.shape
    wp = jnp.pad(w, ((0, 8 - kh), (0, 8 - kw), (0, 0), (0, 0)))
    return wp.reshape(4, 2, 4, 2, cin, cout) \
        .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)


def _stem_conv_s2d(w7, x):
    """The stem's 7x7/stride-2/pad-3 conv computed as a 4x4/stride-1
    VALID conv over space-to-depth pixels — identical arithmetic, MXU-
    friendlier tiling (contraction depth 4*4*12=192 vs 147 with no
    stride-2 window walk). Requires even H, W (every production bucket
    shape is). Derivation: out[i,j] reads padded rows u = 2i + di,
    di in [0,6]; packing pixel parity into channels (x2[q,(a,b,c)] =
    xp[2q+a, 2q'+b, c]) maps tap di = 2ki+a to kernel position ki — the
    di=7 taps are the zero pads in _s2d_kernel."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hq, wq = (H + 6) // 2, (W + 6) // 2
    x2 = xp.reshape(B, hq, 2, wq, 2, C).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(B, hq, wq, 4 * C)
    out = jax.lax.conv_general_dilated(
        x2, _s2d_kernel(w7), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[:, :H // 2, :W // 2]


def _ceil_maxpool_3x3s2(x):
    """MaxPool2d(kernel=3, stride=2, padding=0, ceil_mode=True)
    (reference encoder.py:12). Ceil mode pads only on the bottom/right with
    -inf as needed — computed statically per input shape."""
    H, W = x.shape[1], x.shape[2]
    oh = -(-(H - 3) // 2) + 1
    ow = -(-(W - 3) // 2) + 1
    ph = max(0, (oh - 1) * 2 + 3 - H)
    pw = max(0, (ow - 1) * 2 + 3 - W)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, ph), (0, pw), (0, 0)))


def _bottleneck(p, x, stride: int):
    """stride sits on conv1 (the reference's patch, encoder.py:14-15)."""
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride, 0)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out, 1, 1)))
    out = _bn(p["bn3"], _conv(p["conv3"], out, 1, 0))
    if "downsample" in p:
        x = _bn(p["downsample"]["bn"],
                _conv(p["downsample"]["conv"], x, stride, 0))
    return jax.nn.relu(out + x)


def _trunk(params, x, att_size: int):
    """Everything after conv1+bn1+relu: maxpool, the 4 layers, fc/att
    heads."""
    x = _ceil_maxpool_3x3s2(x)
    for li, layer in enumerate(params["layers"]):
        for b, blk in enumerate(layer):
            stride = 2 if (li > 0 and b == 0) else 1
            x = _bottleneck(blk, x, stride)
    fc = x.mean(axis=(1, 2))                                     # [N,2048]
    att = adaptive_avg_pool2d(x, (att_size, att_size))           # [N,14,14,C]
    return fc, att


def forward_batch(params, imgs, att_size: int = 14):
    """imgs: [N, H, W, 3] normalized float32 (same H, W — bucket by shape).
    Returns (fc [N, 2048], att [N, att_size, att_size, 2048])."""
    x = imgs
    x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, 2, 3)))
    return _trunk(params, x, att_size)


def forward_raw_batch(params, imgs, att_size: int = 14,
                      s2d_stem: bool = None):
    """TPU-side entry for RAW uint8 batches (imgs: [N, H, W, 3] uint8):
    the host ships 4x fewer bytes than the float path and the ImageNet
    normalize runs as part of conv1 — no host numpy normalize, no extra
    elementwise HBM pass (VERDICT r2 weak #1 / SURVEY §2.5 "fused
    decode/resize/normalize" stage, reference encoder.py:29-55).

    The normalize x' = (x/255 - mean)/std = a*x + b is per-channel affine
    and conv1 is linear, so it folds exactly:

      conv1(pad(x', 0)) = conv1_{W*a}(pad(x, 0)) + conv1_W(pad(b*1, 0))

    — the scale a enters conv1's weights; the offset b becomes a constant
    spatial map (constant in the interior, tapering in the 3-pixel pad
    band where zero-padding contributes 0 rather than b). Both terms are
    shape-static; XLA constant-folds the offset map at compile time.
    Numerics match preprocess()+forward_batch to float-reassociation
    tolerance (tests/test_encoder.py::test_forward_raw_batch_parity).

    ``s2d_stem`` (default: the ISC_S2D_STEM env knob) runs conv1 as the
    space-to-depth rewrite (_stem_conv_s2d) when the spatial extents are
    even; odd extents keep the direct conv (only the ``exact`` bucket
    mode can produce them — the resize ladder is all-even)."""
    # compute dtype follows the params (bf16 under the serving policy —
    # uint8 pixel values 0..255 are exactly representable in bf16)
    if s2d_stem is None:
        s2d_stem = bool(_S2D_STEM)
    dt = params["conv1"]["w"].dtype
    x = imgs.astype(dt)
    a = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), dt)
    b = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, dt)
    w_folded = {"w": params["conv1"]["w"] * a[None, None, :, None]}
    if s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        xc = _stem_conv_s2d(w_folded["w"], x)
    else:
        xc = _conv(w_folded, x, 2, 3)
    offset_src = jnp.broadcast_to(b, (1,) + tuple(x.shape[1:3]) + (3,))
    offset_map = _conv(params["conv1"], offset_src, 2, 3)
    x = jax.nn.relu(_bn(params["bn1"], xc + offset_map))
    return _trunk(params, x, att_size)


def forward(params, img, att_size: int = 14):
    """img: [H, W, 3] normalized float32 (see preprocess). Returns
    (fc [2048], att [att_size, att_size, 2048])."""
    fc, att = forward_batch(params, img[None], att_size)
    return fc[0], att[0]


def to_rgb_uint8(image: np.ndarray) -> np.ndarray:
    """gray→RGB + alpha drop, staying uint8 (reference encoder.py:29-33).
    The single mode-normalization helper shared by the host-float path
    (preprocess below) and the raw-uint8 device path
    (preprocessing.extract_imgs_feat bucket_mode='resize' +
    forward_raw_batch, where /255+normalize happen on-device inside
    conv1)."""
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.shape[-1] == 1:          # HxWx1 grayscale from other decoders
        image = np.repeat(image, 3, axis=-1)
    if image.shape[-1] == 4:
        image = image[..., :3]
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError(
            f"expected an HxW / HxWx{{1,3,4}} image, got shape "
            f"{image.shape} — exotic PIL modes (palette, LA, CMYK) must "
            f"be decoded via preprocessing.load_image, which converts "
            f"them to RGB")
    return np.ascontiguousarray(image)


def preprocess(image: np.ndarray) -> np.ndarray:
    """gray->RGB, /255, ImageNet normalize (reference encoder.py:29-37).
    Input HxW or HxWx{3,4} uint8; output HxWx3 float32 (HWC — we keep the
    TPU-native channel-last layout instead of torch's CHW)."""
    x = to_rgb_uint8(image).astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# Weight conversion from the reference's resnet101.pth (torch state_dict)
# ---------------------------------------------------------------------------

def convert_torch_state_dict(sd) -> Dict:
    """Convert a torchvision ResNet-101 state_dict (as loaded by the
    reference, encoder.py:21-23) into this module's param pytree.
    Conv weights transpose [out,in,kh,kw] -> [kh,kw,in,out]."""
    def conv(name):
        w = np.asarray(sd[name + ".weight"], np.float32)
        return {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}

    def bn(name):
        return {
            "scale": jnp.asarray(np.asarray(sd[name + ".weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"], np.float32)),
            "mean": jnp.asarray(
                np.asarray(sd[name + ".running_mean"], np.float32)),
            "var": jnp.asarray(
                np.asarray(sd[name + ".running_var"], np.float32)),
        }

    p: Dict = {"conv1": conv("conv1"), "bn1": bn("bn1"), "layers": []}
    for li, nblocks in enumerate(LAYERS):
        layer = []
        for b in range(nblocks):
            base = f"layer{li + 1}.{b}"
            blk = {
                "conv1": conv(base + ".conv1"), "bn1": bn(base + ".bn1"),
                "conv2": conv(base + ".conv2"), "bn2": bn(base + ".bn2"),
                "conv3": conv(base + ".conv3"), "bn3": bn(base + ".bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                blk["downsample"] = {"conv": conv(base + ".downsample.0"),
                                     "bn": bn(base + ".downsample.1")}
            layer.append(blk)
        p["layers"].append(layer)
    return p
