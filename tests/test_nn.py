"""BN-Inception architecture, caffe pooling semantics, BN folding, ensemble."""

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoquery.nn import bn_inception
from videoquery.nn.bn_inception import avg_pool, fold_bn, max_pool


# -- caffe pooling oracle -----------------------------------------------------

def caffe_pool_oracle(x, k, s, pad, mode):
    """Direct transcription of Caffe's pooling arithmetic (ceil-mode sizing,
    window clipped to padded bounds, AVE divides by the clipped-to-padded
    window size)."""
    n, h, w, c = x.shape
    import math

    ph = math.ceil((h + 2 * pad - k) / s) + 1
    pw = math.ceil((w + 2 * pad - k) / s) + 1
    if pad > 0:
        if (ph - 1) * s >= h + pad:
            ph -= 1
        if (pw - 1) * s >= w + pad:
            pw -= 1
    out = np.zeros((n, ph, pw, c), x.dtype)
    for i in range(ph):
        for j in range(pw):
            hs, ws = i * s - pad, j * s - pad
            he, we = min(hs + k, h + pad), min(ws + k, w + pad)
            pool_size = (he - hs) * (we - ws)
            hs2, ws2 = max(hs, 0), max(ws, 0)
            he2, we2 = min(he, h), min(we, w)
            win = x[:, hs2:he2, ws2:we2, :]
            if mode == "max":
                out[:, i, j] = win.max(axis=(1, 2))
            else:
                out[:, i, j] = win.sum(axis=(1, 2)) / pool_size
    return out


@pytest.mark.parametrize("hw,k,s,pad,mode", [
    (112, 3, 2, 0, "max"),   # pool1
    (56, 3, 2, 0, "max"),    # pool2
    (28, 3, 2, 0, "max"),    # inception_3c/pool (ceil-mode critical: ->14)
    (28, 3, 1, 1, "ave"),    # inception blocks
    (7, 3, 1, 1, "max"),     # inception_5b/pool
    (7, 7, 1, 0, "ave"),     # global_pool
])
def test_pooling_matches_caffe(rng, hw, k, s, pad, mode):
    x = rng.normal(size=(2, hw, hw, 4)).astype(np.float32)
    want = caffe_pool_oracle(x, k, s, pad, mode)
    fn = max_pool if mode == "max" else avg_pool
    got = np.asarray(fn(jnp.asarray(x), k, s, pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ceil_mode_output_sizes():
    """The spatial ladder of BN-Inception: 224->112->56->28->14->7->1."""
    x = jnp.zeros((1, 112, 112, 1))
    assert max_pool(x, 3, 2, 0).shape[1] == 56
    assert max_pool(jnp.zeros((1, 28, 28, 1)), 3, 2, 0).shape[1] == 14


def test_forward_shapes_rgb_and_flow(rng):
    key = jax.random.PRNGKey(0)
    for cin in (3, 10):
        params = bn_inception.init_params(key, in_channels=cin)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, cin)), jnp.float32)
        out = bn_inception.forward(params, x)
        assert out["global_pool"].shape == (1, 1024)
        assert out["fc-action"].shape == (1, 101)
        assert np.isfinite(np.asarray(out["global_pool"])).all()


def test_global_pool_nonnegative(rng):
    """global_pool averages post-ReLU activations -> nonnegative, like the
    all-positive fixture CSVs."""
    params = bn_inception.init_params(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    gp = np.asarray(bn_inception.forward(params, x)["global_pool"])
    assert (gp >= 0).all()


def test_fold_bn_exact(rng):
    """Folded conv+BN == conv then BN, to fp tolerance."""
    cout = 8
    w = rng.normal(size=(3, 3, 4, cout)).astype(np.float32)
    b = rng.normal(size=cout).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, cout).astype(np.float32)
    shift = rng.normal(size=cout).astype(np.float32)
    mean = rng.normal(size=cout).astype(np.float32)
    var = rng.uniform(0.1, 2.0, cout).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 4)), jnp.float32)

    def conv(wi, bi):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(wi), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(bi)

    eps = 1e-5
    ref = (np.asarray(conv(w, b)) - mean) * (scale / np.sqrt(var + eps)) + shift
    wf, bf = fold_bn(w, b, scale, shift, mean, var, eps)
    got = np.asarray(conv(wf, bf))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_bf16_matches_f32_coarsely(rng):
    params = bn_inception.init_params(jax.random.PRNGKey(2))
    x32 = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    gp32 = np.asarray(bn_inception.embed_jit(params, x32))
    gp16 = np.asarray(bn_inception.embed_jit(params, x32.astype(jnp.bfloat16)))
    denom = np.abs(gp32).mean() + 1e-9
    assert np.abs(gp16 - gp32).mean() / denom < 0.1


def test_ensemble_vmap_equals_individual(rng):
    from videoquery.nn.tsn import StreamEnsemble

    key = jax.random.PRNGKey(3)
    ens = StreamEnsemble.random(key, in_channels=3, splits=(1, 2))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    stacked = np.asarray(ens.embed(x))
    for i in range(2):
        single = np.asarray(
            bn_inception.embed_jit(
                jax.tree.map(lambda a, i=i: a[i], ens.stacked_params), x
            )
        )
        np.testing.assert_allclose(stacked[i], single, rtol=2e-5, atol=2e-5)


def test_clip_signature_averages_ticks(rng):
    from videoquery.nn.tsn import TwoStreamTSN

    tsn = TwoStreamTSN.random(jax.random.PRNGKey(4), splits=(1,))
    rgb = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 3)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 10)), jnp.float32)
    sig = tsn.clip_signature(rgb, flow)
    assert sig["rgb"].shape == (1, 1, 1024)
    per_tick = np.stack(
        [np.asarray(tsn.rgb.embed(rgb[:, t]))[0] for t in range(2)]
    ).mean(axis=0)
    np.testing.assert_allclose(np.asarray(sig["rgb"][0]), per_tick,
                               rtol=1e-4, atol=1e-5)


# -- caffemodel wire-format reader -------------------------------------------

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _len_field(field, payload):
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _blob(arr):
    data = np.asarray(arr, "<f4").ravel().tobytes()
    shape_payload = b"".join(_varint(d) for d in np.asarray(arr).shape)
    shape = _len_field(1, shape_payload)  # packed dims
    return _len_field(5, data) + _len_field(7, shape)


def _layer(name, typ, blobs):
    payload = _len_field(1, name.encode()) + _len_field(2, typ.encode())
    for b in blobs:
        payload += _len_field(7, _blob(b))
    return _len_field(100, payload)


def test_read_synthetic_caffemodel(tmp_path, rng):
    """Round-trip a synthetic NetParameter through the wire-format reader."""
    from videoquery.nn.convert_caffe import read_caffemodel

    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    raw = _layer("conv1/7x7_s2", "Convolution", [w, b])
    path = tmp_path / "net.caffemodel"
    path.write_bytes(raw)
    layers = read_caffemodel(str(path))
    assert set(layers) == {"conv1/7x7_s2"}
    np.testing.assert_array_equal(layers["conv1/7x7_s2"][0], w)
    np.testing.assert_array_equal(layers["conv1/7x7_s2"][1], b)


def test_convert_synthetic_full_net(tmp_path, rng):
    """Build a full synthetic caffemodel for the whole architecture, convert,
    and check the converted net runs and matches manual BN math on conv1."""
    from videoquery.nn.convert_caffe import convert

    blob_raw = b""
    shapes = bn_inception.conv_shapes(in_channels=3)
    blobs_np = {}
    for name, (kh, kw, cin, cout) in shapes.items():
        w = rng.normal(size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
        b = rng.normal(size=(cout,)).astype(np.float32) * 0.01
        blobs_np[name] = (w, b)
        blob_raw += _layer(name, "Convolution", [w, b])
        scale = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        shift = rng.normal(size=cout).astype(np.float32) * 0.01
        mean = rng.normal(size=cout).astype(np.float32) * 0.01
        var = rng.uniform(0.5, 1.5, cout).astype(np.float32)
        blobs_np[name + "_bn"] = (scale, shift, mean, var)
        blob_raw += _layer(name + "_bn", "BN", [scale, shift, mean, var])
    fcw = rng.normal(size=(101, 1024)).astype(np.float32) * 0.01
    fcb = np.zeros(101, np.float32)
    blob_raw += _layer("fc-action", "InnerProduct", [fcw, fcb])
    path = tmp_path / "full.caffemodel"
    path.write_bytes(blob_raw)

    params = convert(str(path), in_channels=3)
    # conv1 folding matches fold_bn on the transposed weights
    w, b = blobs_np["conv1/7x7_s2"]
    scale, shift, mean, var = blobs_np["conv1/7x7_s2_bn"]
    wf, bf = fold_bn(w.transpose(2, 3, 1, 0), b, scale, shift, mean, var)
    np.testing.assert_allclose(params["conv1/7x7_s2"]["w"], wf, rtol=1e-6)
    np.testing.assert_allclose(params["conv1/7x7_s2"]["b"], bf, rtol=1e-6)
    # the converted net runs
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    out = bn_inception.forward(jax.tree.map(jnp.asarray, params), x)
    assert out["global_pool"].shape == (1, 1024)
    assert np.isfinite(np.asarray(out["fc-action"])).all()


REF_PROTO = ("/root/reference/src/features_GPU_compute/models/ucf101/"
             "tsn_bn_inception_{}_deploy.prototxt")


@pytest.mark.parametrize("stream,cin", [("rgb", 3), ("flow", 10)])
def test_prototxt_matches_transcribed_architecture(stream, cin):
    """The transcribed INCEPTION_BLOCKS spec must match the actual reference
    deploy prototxt conv-by-conv (guards against transcription drift)."""
    import os

    path = REF_PROTO.format(stream)
    if not os.path.exists(path):
        pytest.skip("reference prototxt unavailable")
    from videoquery.nn.prototxt import load_net

    net = load_net(path)
    assert net["input_dim"] == [1, cin, 224, 224]
    proto_convs = {}
    for layer in net["layer"]:
        if layer["type"] == "Convolution":
            p = layer["convolution_param"]
            proto_convs[layer["name"]] = (
                p.get("kernel_size", 1), p.get("pad", 0), p.get("stride", 1),
                p["num_output"],
            )
    ours = {
        name: (k, pad, stride, cout)
        for name, k, pad, stride, cin_, cout in
        bn_inception._conv_names(in_channels=cin)
    }
    assert set(proto_convs) == set(ours)
    for name in proto_convs:
        assert proto_convs[name] == ours[name], name
    # every conv has a frozen BN companion
    bn_layers = {l["name"] for l in net["layer"] if l["type"] == "BN"}
    for name in proto_convs:
        assert name + "_bn" in bn_layers
        bn = next(l for l in net["layer"] if l["name"] == name + "_bn")
        assert bn["bn_param"]["frozen"] is True


def test_convert_cli_roundtrip(tmp_path, rng):
    """The converter CLI produces an npz bundle the extractor can load."""
    from videoquery.nn.convert_caffe import load_npz, main as convert_main

    # build a synthetic caffemodel for the rgb architecture
    raw = b""
    for name, (kh, kw, cin, cout) in bn_inception.conv_shapes(3).items():
        w = rng.normal(size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
        b = np.zeros(cout, np.float32)
        raw += _layer(name, "Convolution", [w, b])
    raw += _layer("fc-action", "InnerProduct",
                  [rng.normal(size=(101, 1024)).astype(np.float32) * 0.01,
                   np.zeros(101, np.float32)])
    src = tmp_path / "m.caffemodel"
    src.write_bytes(raw)
    out = tmp_path / "w" / "rgb_split1.npz"
    convert_main([str(src), "--stream", "rgb", "--out", str(out)])
    params = load_npz(str(out))
    assert "fc-action" in params and "conv1/7x7_s2" in params
    x = jnp.ones((1, 64, 64, 3))
    emb = bn_inception.embed_jit(jax.tree.map(jnp.asarray, params), x)
    assert emb.shape == (1, 1024)


@pytest.mark.parametrize("stream,cin", [("rgb", 3), ("flow", 10)])
def test_prototxt_executor_matches_transcription(stream, cin, rng):
    """Run the ACTUAL reference deploy graph (prototxt-driven executor) and
    the hand-transcribed bn_inception.apply with identical params: outputs
    must match to float tolerance — connectivity/stride/pad/pool-mode drift
    in the transcription cannot hide."""
    import os

    from videoquery.nn.prototxt_net import apply_prototxt

    path = REF_PROTO.format(stream)
    if not os.path.exists(path):
        pytest.skip("reference prototxt unavailable")
    params = bn_inception.init_params(3, in_channels=cin)
    params = jax.tree.map(jnp.asarray, params)
    x = jnp.asarray(rng.normal(size=(1, 224, 224, cin)) * 0.5, jnp.float32)
    want = bn_inception.forward(params, x)
    got = jax.jit(lambda p, x: apply_prototxt(path, p, x))(params, x)
    np.testing.assert_allclose(np.asarray(got["global_pool"]),
                               np.asarray(want["global_pool"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["fc-action"]),
                               np.asarray(want["fc-action"]),
                               rtol=1e-4, atol=1e-4)


# -- V1LayerParameter (legacy `layers`) format --------------------------------
# Old Caffe saves (the era of the TSN caffemodels) use NetParameter field 2
# with V1LayerParameter {bottom=2, top=3, name=4, type=5 enum, blobs=6} and
# legacy BlobProto dims {num=1, channels=2, height=3, width=4} + packed
# float data (field 5). convert_caffe must read this layout unchanged.

def _scalar_field(field, n):
    return _varint((field << 3) | 0) + _varint(n)


def _blob_v1(arr):
    """Legacy 4-D dims + packed float data, no BlobShape submessage."""
    a = np.asarray(arr, "<f4")
    dims = list(a.shape)
    while len(dims) < 4:
        dims.insert(0, 1)  # caffe legacy blobs are always 4-d (1-padded)
    payload = b"".join(_scalar_field(i + 1, d) for i, d in enumerate(dims))
    return payload + _len_field(5, a.ravel().tobytes())


def _layer_v1(name, type_enum, blobs, bottom="x", top="y"):
    payload = _len_field(2, bottom.encode()) + _len_field(3, top.encode())
    payload += _len_field(4, name.encode())
    payload += _scalar_field(5, type_enum)  # V1 type is an enum varint
    for b in blobs:
        payload += _len_field(6, _blob_v1(b))
    return _len_field(2, payload)  # NetParameter.layers (V1) = field 2


def test_read_v1_caffemodel_layout(tmp_path, rng):
    """Realistic V1 blob layout: packed float data, legacy 1-padded 4-d
    dims, enum layer types, bottom/top strings before the name field."""
    from videoquery.nn.convert_caffe import read_caffemodel

    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)           # dims (1,1,1,8)
    fc = rng.normal(size=(101, 1024)).astype(np.float32)   # dims (1,1,101,1024)
    raw = (_len_field(1, b"net")                            # NetParameter.name
           + _layer_v1("conv1/7x7_s2", 4, [w, b])           # CONVOLUTION=4
           + _layer_v1("fc-action", 14, [fc, np.zeros(101, np.float32)]))
    path = tmp_path / "v1.caffemodel"
    path.write_bytes(raw)
    layers = read_caffemodel(str(path))
    assert set(layers) == {"conv1/7x7_s2", "fc-action"}
    np.testing.assert_array_equal(
        layers["conv1/7x7_s2"][0].reshape(8, 4, 3, 3), w)
    # legacy dims surface as the 1-padded 4-d shape
    assert layers["conv1/7x7_s2"][1].shape in ((1, 1, 1, 8), (8,))
    np.testing.assert_array_equal(layers["conv1/7x7_s2"][1].reshape(8), b)
    np.testing.assert_array_equal(layers["fc-action"][0].reshape(101, 1024), fc)


def test_convert_v1_full_net(tmp_path, rng):
    """Full synthetic V1-format caffemodel through convert(): same result as
    the modern layout (the two serializations must be interchangeable)."""
    from videoquery.nn.convert_caffe import convert

    raw_v1 = b""
    raw_v2 = b""
    shapes = bn_inception.conv_shapes(in_channels=3)
    for name, (kh, kw, cin, cout) in shapes.items():
        w = rng.normal(size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
        b = rng.normal(size=(cout,)).astype(np.float32) * 0.01
        bn = [rng.uniform(0.5, 1.5, cout).astype(np.float32),
              rng.normal(size=cout).astype(np.float32) * 0.01,
              rng.normal(size=cout).astype(np.float32) * 0.01,
              rng.uniform(0.5, 1.5, cout).astype(np.float32)]
        raw_v1 += _layer_v1(name, 4, [w, b]) + _layer_v1(name + "_bn", 0, bn)
        raw_v2 += _layer(name, "Convolution", [w, b]) + _layer(name + "_bn", "BN", bn)
    fcw = rng.normal(size=(101, 1024)).astype(np.float32) * 0.01
    fcb = np.zeros(101, np.float32)
    raw_v1 += _layer_v1("fc-action", 14, [fcw, fcb])
    raw_v2 += _layer("fc-action", "InnerProduct", [fcw, fcb])
    p1 = tmp_path / "v1.caffemodel"
    p2 = tmp_path / "v2.caffemodel"
    p1.write_bytes(raw_v1)
    p2.write_bytes(raw_v2)
    params_v1 = convert(str(p1), in_channels=3)
    params_v2 = convert(str(p2), in_channels=3)
    for layer in params_v2:
        for k in params_v2[layer]:
            np.testing.assert_array_equal(params_v1[layer][k],
                                          params_v2[layer][k])
