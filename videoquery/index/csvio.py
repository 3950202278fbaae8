"""Feature-CSV import/export, byte-compatible with the reference format.

The reference's extraction stage writes, per (video, model-split), one CSV
per stream named ``<stream>_<blob>_features.csv`` with a 5-field provenance
header and rows ``clip#,f1,...,fD`` (calcSig_wOF.py:116-134), laid out as
``<root>/<video>/<modelname>/``; the DB loader walks that tree and parses the
header by splitting on '=' (api_load_records.py:41-61). Both sides are
reproduced here so feature archives interchange freely with the reference.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Iterator, Sequence

import numpy as np


@dataclasses.dataclass
class FeatureCSV:
    """One parsed feature CSV."""

    video: str
    video_url: str
    stream: str
    feature_blob: str
    weights_uri: str
    clip_numbers: np.ndarray  # i64[N]
    features: np.ndarray      # f64[N, D]

    @property
    def n_clips(self) -> int:
        return len(self.clip_numbers)


def write_features_csv(
    path: str,
    video: str,
    video_url: str,
    stream: str,
    feature_blob: str,
    weights_uri: str,
    rows: Iterable[tuple[int, Sequence[float]]],
) -> None:
    """Write the reference CSV format byte-for-byte (calcSig_wOF.py:125-133):
    header ``video =<v>, video url =<u>, CNN stream =<s>, feature blob =<b>,
    caffe model =<w>`` then ``clip,f1,...`` rows with str(float) formatting."""
    header = (
        "video =" + video + ", video url =" + video_url + ", CNN stream =" + stream
        + ", feature blob =" + feature_blob + ", caffe model =" + weights_uri
    )
    with open(path, "w") as fout:
        fout.write(header + "\n")
        for clip_no, vec in rows:
            fout.write(str(int(clip_no)) + "," + ",".join(map(str, np.asarray(vec).tolist())) + "\n")


def read_features_csv(path: str, n_threads: int | None = None) -> FeatureCSV:
    """Parse one feature CSV, header fields split on '=' exactly like the
    reference loader (api_load_records.py:48-54)."""
    try:
        from videoquery.index import _native_csv

        parsed = _native_csv.parse(path, n_threads)
        if parsed is not None:
            header_fields, clips, feats = parsed
            return _feature_csv_from_parts(header_fields, clips, feats)
    except ImportError:
        pass
    with open(path, "r") as f:
        header = f.readline().rstrip("\n").split(",")
        clips: list[int] = []
        feats: list[np.ndarray] = []
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            cells = line.split(",")
            clips.append(int(cells[0]))
            feats.append(np.asarray(cells[1:], np.float64))
    return _feature_csv_from_parts(header, np.asarray(clips, np.int64),
                                   np.asarray(feats, np.float64))


def _feature_csv_from_parts(header_fields, clips, feats) -> FeatureCSV:
    return FeatureCSV(
        video=header_fields[0].split("=")[-1],
        video_url=header_fields[1].split("=")[-1],
        stream=header_fields[2].split("=")[-1],
        feature_blob=header_fields[3].split("=")[-1],
        weights_uri=header_fields[4].split("=")[-1],
        clip_numbers=np.asarray(clips, np.int64),
        features=np.asarray(feats, np.float64),
    )


def list_feature_tree(root: str) -> list[tuple[str, int, str]]:
    """(video, split, csv_path) entries of a feature tree, sorted."""
    out = []
    for video_dir in sorted(os.scandir(root), key=lambda e: e.name):
        if not video_dir.is_dir():
            continue
        for split_dir in sorted(os.scandir(video_dir.path), key=lambda e: e.name):
            if not split_dir.is_dir():
                continue
            split = int(split_dir.name[-1])
            for entry in sorted(os.scandir(split_dir.path), key=lambda e: e.name):
                if (entry.is_file() and entry.name.endswith(".csv")
                        and not entry.name.startswith(".")):
                    out.append((video_dir.name, split, entry.path))
    return out


def read_feature_tree_parallel(
    root: str, workers: int = 8
) -> list[tuple[str, int, FeatureCSV]]:
    """Parallel tree read: the native parser releases the GIL during the C
    call, so a thread pool over files scales with cores."""
    from concurrent.futures import ThreadPoolExecutor

    entries = list_feature_tree(root)
    # one parser thread per file: the pool provides the parallelism (nesting
    # the native parser's own threads on top thrashes the cores)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        parsed = list(pool.map(lambda e: read_features_csv(e[2], n_threads=1),
                               entries))
    return [(v, s, csvf) for (v, s, _p), csvf in zip(entries, parsed)]


def read_feature_tree(root: str) -> Iterator[tuple[str, int, FeatureCSV]]:
    """Walk the two-level ``<root>/<video>/<split_dir>/*.csv`` tree the
    loader expects (load_db.py:16-28); the split number is the final
    character of the split dir name (api_load_records.py:43).

    Yields (video_dir_name, split, FeatureCSV)."""
    for video, split, path in list_feature_tree(root):
        yield video, split, read_features_csv(path)
