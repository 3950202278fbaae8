"""FeatureIndex construction, padding, and CSV round-trip/compat."""

import os

import numpy as np
import pytest

from videoquery.index.csvio import (
    read_feature_tree,
    read_features_csv,
    write_features_csv,
)
from videoquery.index.store import FeatureIndex, FeatureRecord

from conftest import REFERENCE_FIXTURES as REF_ROOT


def test_index_build_and_padding(rng):
    records = [
        FeatureRecord(5, "rgb", 1, "global_pool", rng.normal(size=4)),
        FeatureRecord(2, "rgb", 1, "global_pool", rng.normal(size=4)),
        FeatureRecord(2, "warped_optical_flow", 2, "global_pool", rng.normal(size=4)),
    ]
    idx = FeatureIndex.build(
        records, ("rgb", "warped_optical_flow"), feature_dim=4, pad_multiple=8
    )
    assert idx.n_clips == 2
    assert idx.n_padded == 8
    assert list(idx.clip_ids) == [2, 5]
    assert idx.splits == (1, 2)
    mask = np.asarray(idx.mask)
    assert mask.sum() == 3
    assert not mask[:, :, 2:].any()  # padding rows never masked in


def test_index_rejects_dim_mismatch(rng):
    records = [
        FeatureRecord(1, "rgb", 1, "global_pool", rng.normal(size=4)),
        FeatureRecord(2, "rgb", 1, "global_pool", rng.normal(size=5)),
    ]
    with pytest.raises(ValueError):
        FeatureIndex.build(records, ("rgb",), feature_dim=4)


def test_csv_roundtrip(tmp_path, rng):
    path = str(tmp_path / "rgb_global_pool_features.csv")
    vecs = rng.normal(size=(3, 16))
    write_features_csv(
        path, "vid", "../vid/", "rgb", "global_pool", "/w.caffemodel",
        [(i + 1, v) for i, v in enumerate(vecs)],
    )
    out = read_features_csv(path)
    assert out.video == "vid"
    assert out.stream == "rgb"
    assert out.feature_blob == "global_pool"
    assert out.weights_uri == "/w.caffemodel"
    np.testing.assert_array_equal(out.clip_numbers, [1, 2, 3])
    np.testing.assert_allclose(out.features, vecs, rtol=1e-15)


def test_csv_header_byte_compatible(tmp_path):
    """Header must match the reference writer byte-for-byte
    (calcSig_wOF.py:125-127)."""
    path = str(tmp_path / "f.csv")
    write_features_csv(path, "V", "u/", "rgb", "global_pool", "/m.caffemodel",
                       [(1, [0.5])])
    with open(path) as f:
        header = f.readline().rstrip("\n")
    assert header == (
        "video =V, video url =u/, CNN stream =rgb, feature blob =global_pool,"
        " caffe model =/m.caffemodel"
    )


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="no reference fixtures")
def test_read_reference_fixture_tree():
    """The checked-in reference CSVs (SURVEY.md C17) parse cleanly: 2 videos
    x 3 splits x 2 streams, 1024-d features."""
    seen = {}
    for corpus in sorted(os.listdir(REF_ROOT)):
        for video, split, csvf in read_feature_tree(os.path.join(REF_ROOT, corpus)):
            assert csvf.features.shape[1] == 1024
            assert csvf.stream in ("rgb", "warped_optical_flow")
            assert csvf.feature_blob == "global_pool"
            seen.setdefault((video, split), set()).add(csvf.stream)
    assert len(seen) == 6  # 2 videos x 3 splits
    assert all(streams == {"rgb", "warped_optical_flow"} for streams in seen.values())


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="no reference fixtures")
def test_reference_fixture_reserializes_rows(tmp_path):
    """Data rows survive a read -> write -> read round trip with identical
    repr-level values."""
    corpus = os.path.join(REF_ROOT, "stock-video-clips_features")
    video, split, csvf = next(iter(read_feature_tree(corpus)))
    path = str(tmp_path / "out.csv")
    write_features_csv(
        path, csvf.video, csvf.video_url, csvf.stream, csvf.feature_blob,
        csvf.weights_uri, list(zip(csvf.clip_numbers, csvf.features)),
    )
    again = read_features_csv(path)
    np.testing.assert_array_equal(again.clip_numbers, csvf.clip_numbers)
    np.testing.assert_array_equal(again.features, csvf.features)


def test_binary_shard_roundtrip(tmp_path, rng):
    """Index -> .vqidx shards -> index, across shard boundaries."""
    from videoquery.index.persist import load_index_binary, save_index

    records = [
        FeatureRecord(cid, s, k, "global_pool", rng.normal(size=16))
        for cid in range(1, 101)
        for s in ("rgb", "warped_optical_flow")
        for k in (1, 2)
    ]
    index = FeatureIndex.build(records, ("rgb", "warped_optical_flow"),
                               feature_dim=16, pad_multiple=8)
    paths = save_index(index, str(tmp_path / "idx"), shard_clips=32)
    assert len(paths) == 4  # 100 clips / 32 per shard
    back = load_index_binary(str(tmp_path / "idx"), pad_multiple=8)
    assert back.n_clips == index.n_clips
    assert back.streams == index.streams
    assert back.splits == index.splits
    np.testing.assert_array_equal(back.clip_ids, index.clip_ids)
    n = index.n_clips
    np.testing.assert_array_equal(
        np.asarray(back.feats)[:, :, :n], np.asarray(index.feats)[:, :, :n])
    np.testing.assert_array_equal(
        np.asarray(back.mask)[:, :, :n], np.asarray(index.mask)[:, :, :n])


def test_binary_shard_query_equivalence(tmp_path, rng):
    """A query over the reloaded shards matches the original index."""
    from videoquery.index.persist import load_index_binary, save_index
    from videoquery.search.engine import SearchEngine

    records = [
        FeatureRecord(cid, s, k, "global_pool", rng.normal(size=16))
        for cid in range(1, 41)
        for s in ("rgb", "warped_optical_flow")
        for k in (1,)
    ]
    index = FeatureIndex.build(records, ("rgb", "warped_optical_flow"),
                               feature_dim=16)
    save_index(index, str(tmp_path / "idx"), shard_clips=16)
    back = load_index_binary(str(tmp_path / "idx"))
    target = {s: {1: rng.normal(size=16).tolist()}
              for s in ("rgb", "warped_optical_flow")}
    w = {"rgb": 1.0, "warped_optical_flow": 1.5}
    s1 = SearchEngine(index).compute_similarities(target).scores(w)
    s2 = SearchEngine(back).compute_similarities(target).scores(w)
    assert s1.keys() == s2.keys()
    for c in s1:
        np.testing.assert_allclose(s1[c], s2[c], rtol=1e-6)


def test_native_parser_bit_parity(tmp_path, rng):
    """The native CSV parser (native/vqio.cc) must be BIT-identical to
    Python float() on every value — its Eisel-Lemire fast path certifies
    correct rounding or defers to strtod, so any divergence is a bug, not a
    tolerance question (PARITY.md 'Exact'). Covers shortest-repr doubles
    across the full exponent range, 17-digit mantissas (beyond the 2^53
    Clinger fast path), halfway-rounding literals, subnormals, and
    long-digit strings that overflow the 19-digit accumulator."""
    native = pytest.importorskip("videoquery.index._native_csv")

    magnitudes = rng.normal(size=200) * np.power(
        10.0, rng.integers(-300, 300, size=200).astype(np.float64))
    adversarial = [
        0.0, -0.0, 1.0, -1.0,
        5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
        float.fromhex("0x1.0000000000001p0"),
        1.00000000000000011102230246251565404236316680908203125,
        9007199254740993.0, 9.007199254740993e15, 7.2057594037927933e16,
        1e22, 1e23, 8e22,
    ]
    values = np.concatenate([magnitudes, np.asarray(adversarial)])
    rows = [(1, values)]
    path = str(tmp_path / "rgb_global_pool_features.csv")
    write_features_csv(path, "v", "u/", "rgb", "global_pool", "m", rows)

    parsed = native.parse(path)
    assert parsed is not None, "native parser declined a normal file"
    _, clips, feats = parsed
    with open(path) as f:
        f.readline()
        cells = f.readline().rstrip("\n").split(",")
    py = np.asarray(cells[1:], np.float64)
    assert np.array_equal(
        py.view(np.uint64), feats[0].view(np.uint64)
    ), "native parse diverged from Python float() at the bit level"

    # long-digit strings (> 19 significant digits force the truncated
    # path) and hex floats (strtod owns hex syntax — the decimal fast
    # path must defer, not mis-stop at 'x')
    long_csv = str(tmp_path / "long.csv")
    literals = ["123456789012345678901234567890e-35",
                "0.00000000000000000000000000000000000001",
                "3.5714285714285714285714285714286e-1",
                "9999999999999999999999999e-30",
                "0x10", "0x1.8p3", "-0X2"]
    with open(long_csv, "w") as f:
        f.write("video =v, video url =u/, CNN stream =rgb,"
                " feature blob =global_pool, caffe model =m\n")
        f.write("1," + ",".join(literals) + "\n")
    parsed = native.parse(long_csv)
    assert parsed is not None
    want = np.asarray([float.fromhex(s) if "x" in s.lower() else float(s)
                       for s in literals])  # strtod semantics incl. hex
    assert np.array_equal(want.view(np.uint64), parsed[2][0].view(np.uint64))
