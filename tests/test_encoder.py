"""Encoder parity: our JAX patched ResNet-101 vs a pure-torch replica of
the reference's ResNet (torchvision semantics built from torch core — the
image lacks torchvision), weights converted through convert_torch_state_dict.
Covers SURVEY.md §7 hard part 5 (ceil-mode maxpool, moved strides, faithful
conversion). Plus extract_imgs_feat end-to-end over PIL-decoded images."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from insenticap_model_tpu.models import encoder as enc

pytestmark = pytest.mark.slow  # excluded from the fast gate

LAYERS = (3, 4, 23, 3)
MIDS = (64, 128, 256, 512)


class Bottleneck(tnn.Module):
    """torchvision Bottleneck with the reference's patch applied: stride on
    conv1 (reference encoder.py:13-15 moves it from conv2)."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, stride=stride,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=1, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class PatchedResNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        # the reference's maxpool patch (encoder.py:12)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=0, ceil_mode=True)
        inplanes = 64
        for li, (nblocks, mid) in enumerate(zip(LAYERS, MIDS)):
            stride = 1 if li == 0 else 2
            down = tnn.Sequential(
                tnn.Conv2d(inplanes, mid * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(mid * 4))
            blocks = [Bottleneck(inplanes, mid, stride, down)]
            inplanes = mid * 4
            for _ in range(nblocks - 1):
                blocks.append(Bottleneck(inplanes, mid))
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

    def forward(self, x, att_size=14):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        fc = x.mean([2, 3]).squeeze(0)
        att = torch.nn.functional.adaptive_avg_pool2d(x, att_size)
        return fc, att.squeeze(0).permute(1, 2, 0)


def test_resnet101_parity_with_converted_weights():
    torch.manual_seed(0)
    model = PatchedResNet().eval()
    # randomize BN stats so the affine path is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.05)

    params = enc.convert_torch_state_dict(model.state_dict())

    g = np.random.default_rng(0)
    img = g.integers(0, 256, size=(96, 112, 3)).astype(np.uint8)
    x = enc.preprocess(img)

    with torch.no_grad():
        t_fc, t_att = model(
            torch.from_numpy(x.transpose(2, 0, 1)[None]).float())
    j_fc, j_att = enc.forward(params, x)

    np.testing.assert_allclose(np.asarray(j_fc), t_fc.numpy(), atol=2e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_att), t_att.numpy(), atol=2e-3,
                               rtol=1e-3)


def test_preprocess_variants():
    gray = np.zeros((10, 12), np.uint8)
    assert enc.preprocess(gray).shape == (10, 12, 3)
    rgba = np.zeros((10, 12, 4), np.uint8)
    assert enc.preprocess(rgba).shape == (10, 12, 3)
    rgb = np.full((4, 4, 3), 255, np.uint8)
    out = enc.preprocess(rgb)
    np.testing.assert_allclose(
        out[0, 0], (1.0 - enc.IMAGENET_MEAN) / enc.IMAGENET_STD, rtol=1e-6)


def test_extract_imgs_feat_e2e(tmp_path):
    """PIL decode → encoder → h5 store, keyed by filename (reference
    preprocess.py:23-50), on a tiny random-weight encoder via monkeypatched
    dims? — the full 101 is too slow per image here, so run 2 images only."""
    from PIL import Image
    import h5py
    from insenticap_model_tpu import preprocessing as pp

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    g = np.random.default_rng(0)
    for i, mode in enumerate(("RGB", "L")):
        arr = g.integers(0, 255, size=(64, 72, 3)).astype(np.uint8)
        im = Image.fromarray(arr).convert(mode)
        im.save(imgs / f"img{i}.jpg")
    # a second shape bucket
    arr = g.integers(0, 255, size=(72, 64, 3)).astype(np.uint8)
    Image.fromarray(arr).save(imgs / "img2.jpg")

    import jax
    params = enc.init_params(jax.random.PRNGKey(0))
    feats = tmp_path / "feats"
    pp.extract_imgs_feat(str(imgs), str(feats), params, att_size=14,
                         batch_size=2)

    with h5py.File(feats / "feats_fc.h5") as f_fc, \
            h5py.File(feats / "feats_att.h5") as f_att:
        assert set(f_fc.keys()) == {"img0.jpg", "img1.jpg", "img2.jpg"}
        assert f_fc["img0.jpg"].shape == (2048,)
        assert f_att["img0.jpg"].shape == (14, 14, 2048)
        assert np.isfinite(f_fc["img0.jpg"][:]).all()


def test_forward_raw_batch_parity():
    """The raw-uint8 device path (normalize folded into conv1 + offset
    map, encoder.forward_raw_batch) equals host preprocess() + the float
    path to float-reassociation tolerance, including the 3-pixel pad band
    where the offset map tapers (VERDICT r2 weak #1)."""
    import jax
    params = enc.init_params(jax.random.PRNGKey(3))
    g = np.random.default_rng(7)
    raw = g.integers(0, 256, size=(2, 70, 66, 3)).astype(np.uint8)

    fc_f, att_f = enc.forward_batch(
        params, np.stack([enc.preprocess(r) for r in raw]))
    fc_r, att_r = enc.forward_raw_batch(params, raw)
    np.testing.assert_allclose(np.asarray(fc_r), np.asarray(fc_f),
                               rtol=5e-3)
    # atol scaled to the activation magnitude (random-init activations sit
    # in the thousands; near-zero ReLU outputs flip sides under
    # reassociation)
    scale = float(np.abs(np.asarray(att_f)).max())
    np.testing.assert_allclose(np.asarray(att_r), np.asarray(att_f),
                               rtol=5e-3, atol=1e-4 * scale)


def test_s2d_stem_parity():
    """The ISC_S2D_STEM rewrite (conv1 as a 4x4/s1 conv over
    space-to-depth pixels, encoder._stem_conv_s2d) is the same
    arithmetic re-tiled: forward_raw_batch(s2d_stem=True) must match
    the direct stem to reassociation tolerance on even extents, and the
    knob must fall back to the direct conv on odd extents (exact bucket
    mode can produce them)."""
    import jax
    params = enc.init_params(jax.random.PRNGKey(3))
    g = np.random.default_rng(11)
    raw = g.integers(0, 256, size=(2, 64, 58, 3)).astype(np.uint8)

    fc_d, att_d = enc.forward_raw_batch(params, raw, s2d_stem=False)
    fc_s, att_s = enc.forward_raw_batch(params, raw, s2d_stem=True)
    fscale = float(np.abs(np.asarray(fc_d)).max())
    np.testing.assert_allclose(np.asarray(fc_s), np.asarray(fc_d),
                               rtol=5e-3, atol=1e-5 * fscale)
    scale = float(np.abs(np.asarray(att_d)).max())
    np.testing.assert_allclose(np.asarray(att_s), np.asarray(att_d),
                               rtol=5e-3, atol=1e-4 * scale)

    raw_odd = g.integers(0, 256, size=(1, 65, 58, 3)).astype(np.uint8)
    fc_od, _ = enc.forward_raw_batch(params, raw_odd, s2d_stem=False)
    fc_os, _ = enc.forward_raw_batch(params, raw_odd, s2d_stem=True)
    np.testing.assert_array_equal(np.asarray(fc_os), np.asarray(fc_od))


def test_s2d_stem_conv_parity_at_production_shapes():
    """Stem-level (conv1 only) f32 parity of _stem_conv_s2d vs the
    direct conv at EVERY production resize-bucket shape — the shapes the
    ISC_S2D_STEM knob would actually serve (DEFAULT_BUCKET_SHAPES are
    all even by construction)."""
    import jax
    import jax.numpy as jnp

    from insenticap_model_tpu import preprocessing as pp

    w = jax.random.normal(jax.random.PRNGKey(5), (7, 7, 3, 8),
                          jnp.float32) * 0.1
    g = np.random.default_rng(6)
    for h, wd in pp.DEFAULT_BUCKET_SHAPES:
        x = jnp.asarray(
            g.normal(size=(1, h, wd, 3)).astype(np.float32))
        direct = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        s2d = enc._stem_conv_s2d(w, x)
        assert s2d.shape == direct.shape == (1, h // 2, wd // 2, 8)
        np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                                   rtol=1e-5, atol=1e-5)


def test_bucket_assignment_and_resize():
    from insenticap_model_tpu import preprocessing as pp
    shapes = pp.DEFAULT_BUCKET_SHAPES
    assert pp.bucket_for_shape(448, 448, shapes) == (448, 448)
    assert pp.bucket_for_shape(480, 640, shapes) == (384, 512)  # landscape
    assert pp.bucket_for_shape(640, 480, shapes) == (512, 384)  # portrait
    assert pp.bucket_for_shape(500, 510, shapes) == (448, 448)

    g = np.random.default_rng(1)
    img = g.integers(0, 256, size=(100, 120, 3)).astype(np.uint8)
    out = pp.resize_to_bucket(img, (64, 96))
    assert out.shape == (64, 96, 3) and out.dtype == np.uint8
    # identity when already bucket-shaped (bit-for-bit exactness hook)
    same = pp.resize_to_bucket(img, (100, 120))
    assert same is img


def test_extract_imgs_feat_resize_mode(tmp_path):
    """bucket_mode='resize': arbitrary-size images produce O(#buckets)
    compiled programs; an image already at a bucket shape matches the
    exact path bit-for-bit (the documented-divergence anchor)."""
    from PIL import Image
    import h5py
    import jax
    from insenticap_model_tpu import preprocessing as pp

    buckets = ((64, 64), (48, 64), (64, 48))  # tiny ladder for CPU speed
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    g = np.random.default_rng(0)
    sizes = {"a.jpg": (64, 64), "b.jpg": (100, 130), "c.jpg": (130, 100),
             "d.jpg": (64, 64)}
    for nm, (h, w) in sizes.items():
        arr = g.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(imgs / nm, quality=95)

    params = enc.init_params(jax.random.PRNGKey(0))
    feats = tmp_path / "feats"
    pp.extract_imgs_feat(str(imgs), str(feats), params, att_size=2,
                         batch_size=2, bucket_mode="resize",
                         bucket_shapes=buckets)
    with h5py.File(feats / "feats_fc.h5") as f_fc:
        assert set(f_fc.keys()) == set(sizes)
        fc_a = f_fc["a.jpg"][:]

    # bit-parity anchor: a.jpg is already (64,64) -> no resize; the same
    # jitted program on the same batch must reproduce the stored features
    raw = pp.to_rgb_uint8(pp.load_image(str(imgs / "a.jpg")))
    d = pp.to_rgb_uint8(pp.load_image(str(imgs / "d.jpg")))
    fc_direct, _ = jax.jit(
        lambda p, x: enc.forward_raw_batch(p, x, 2))(params,
                                                     np.stack([raw, d]))
    np.testing.assert_array_equal(fc_a, np.asarray(fc_direct[0]))


def test_load_image_exotic_modes(tmp_path):
    """Decode-mode normalization: palette PNGs must decode to their RGB
    colors (a bare np.asarray yields palette INDICES — the skimage path
    the reference uses converts internally, preprocess.py:37-39), L stays
    2-D, RGBA drops alpha, and HxWx1 arrays broadcast to 3 channels."""
    from PIL import Image
    from insenticap_model_tpu import preprocessing as pp

    g = np.random.default_rng(0)
    rgb = g.integers(0, 256, size=(10, 12, 3)).astype(np.uint8)

    p_path = tmp_path / "p.png"
    Image.fromarray(rgb).convert(
        "P", palette=Image.ADAPTIVE, colors=16).save(p_path)
    arr = pp.load_image(str(p_path))
    assert arr.ndim == 3 and arr.shape == (10, 12, 3)
    # colors, not palette indices: must match PIL's own RGB conversion
    expect = np.asarray(Image.open(p_path).convert("RGB"))
    np.testing.assert_array_equal(arr, expect)

    l_path = tmp_path / "l.png"
    Image.fromarray(rgb[..., 0], mode="L").save(l_path)
    arr = pp.load_image(str(l_path))
    assert arr.ndim == 2                      # reference keeps gray 2-D
    assert pp.to_rgb_uint8(arr).shape == (10, 12, 3)

    a_path = tmp_path / "a.png"
    rgba = np.concatenate([rgb, rgb[..., :1]], axis=-1)
    Image.fromarray(rgba, mode="RGBA").save(a_path)
    np.testing.assert_array_equal(pp.load_image(str(a_path)), rgb)

    cmyk_path = tmp_path / "c.jpg"
    Image.fromarray(rgb).convert("CMYK").save(cmyk_path)
    arr = pp.load_image(str(cmyk_path))
    assert arr.shape == (10, 12, 3)           # converted, not CMY-sliced

    np.testing.assert_array_equal(
        pp.to_rgb_uint8(rgb[..., :1]), np.repeat(rgb[..., :1], 3, axis=-1))
    with pytest.raises(ValueError):
        pp.to_rgb_uint8(np.zeros((4, 4, 2), np.uint8))  # LA must not pass
