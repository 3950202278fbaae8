"""Service-layer units: action routing, repository conversion, DB loader."""

import json
import os

import numpy as np
import pytest

from videoquery.core.config import HyperParams
from videoquery.index.csvio import write_features_csv
from videoquery.service.client import resolve_action
from videoquery.service.loader import DBLoader, load_index
from videoquery.service.repository import APIRepository
from videoquery.testing.fake_api import FakeAPI, FakeClient


def test_action_routing():
    """Action pairs resolve to the DRF routes of SURVEY.md Appendix A."""
    assert resolve_action(["query-state", "compute-new", "list"]) == (
        "GET", "query-state/compute-new/", False)
    assert resolve_action(["videos", "list"]) == ("GET", "videos/", False)
    assert resolve_action(["videos", "create"]) == ("POST", "videos/", False)
    assert resolve_action(["queries", "read"]) == ("GET", "queries/{id}/", True)
    assert resolve_action(["queries", "partial_update"]) == (
        "PATCH", "queries/{id}/", True)
    assert resolve_action(["video-clips", "features"]) == (
        "GET", "video-clips/{id}/features/", True)
    assert resolve_action(["search-sets", "features"]) == (
        "GET", "search-sets/{id}/features/", True)
    with pytest.raises(ValueError):
        resolve_action(["videos", "explode"])


def test_repository_split_key_conversion():
    """bootstrapped_target JSON split keys are converted str -> int
    (api_repository.py:65-78)."""
    api = FakeAPI()
    v = api.add_video("v")
    c = api.add_clip(v["id"], 1)
    api.add_feature(c["id"], "rgb", 1, [1.0, 0.0])
    ss = api.add_search_set("s", [c["id"]])
    q = api.add_query("q", v["id"], 1, c["id"], ss["id"])
    qr = api.action(["query-results", "create"], {
        "round": 1, "match_criterion": 0.8, "weights": [1.0, 1.5],
        "query": q["id"],
        "bootstrapped_target": json.dumps({"rgb": {"1": [0.5, 0.5]}}),
    })
    api.action(["matches", "create"], {
        "query_result": qr["id"], "score": 0.9, "user_match": None,
        "video_clip": c["id"]})
    api.request_revision(q["id"])
    repo = APIRepository(FakeClient(api))
    status = repo.get_status()
    bt = status["revise"]["latest_query_result"]["bootstrapped_target"]
    assert list(bt["rgb"].keys()) == [1]  # int key, not "1"


def make_csv_tree(tmp_path, rng, videos=("vidA", "vidB"), splits=(1, 2),
                  n_clips=3, dim=8):
    root = tmp_path / "features"
    for v in videos:
        for s in splits:
            d = root / v / f"UCF101_split{s}"
            os.makedirs(d)
            for stream in ("rgb", "warped_optical_flow"):
                write_features_csv(
                    str(d / f"{stream}_global_pool_features.csv"),
                    v, f"../{v}/", stream, "global_pool", f"/m{s}.caffemodel",
                    [(i + 1, rng.normal(size=dim)) for i in range(n_clips)],
                )
    return str(root)


def test_db_loader_idempotent(tmp_path, rng):
    root = make_csv_tree(tmp_path, rng)
    api = FakeAPI()
    loader = DBLoader(FakeClient(api))
    n = loader.load_tree(root)
    assert n == 2 * 2 * 2 * 3  # videos x splits x streams x clips
    n_videos = len(api.videos)
    n_clips = len(api.video_clips)
    n_features = len(api.features)
    assert n_videos == 2
    assert n_clips == 2 * 3
    assert n_features == 2 * 2 * 2 * 3
    # rerun: fully idempotent (api_load_records create-or-get semantics)
    loader.load_tree(root)
    assert len(api.videos) == n_videos
    assert len(api.video_clips) == n_clips
    assert len(api.features) == n_features


def test_load_index_fast_path(tmp_path, rng):
    root = make_csv_tree(tmp_path, rng)
    idx = load_index(root, HyperParams(), feature_dim=8)
    assert idx.n_clips == 6
    assert idx.splits == (1, 2)
    assert np.asarray(idx.mask).sum() == 2 * 2 * 2 * 3


def test_authenticate_posts_env_credentials(monkeypatch):
    """Token auth from env creds (authenticate.py:6-24 contract)."""
    from videoquery.service.client import authenticate

    monkeypatch.setenv("API_CLIENT_USERNAME", "alice")
    monkeypatch.setenv("API_CLIENT_PASSWORD", "s3cret")

    calls = {}

    class FakeSession:
        def post(self, url, data=None):
            calls["url"] = url
            calls["data"] = data

            class R:
                @staticmethod
                def json():
                    return {"token": "tok123"}

            return R()

    token = authenticate("http://api:8000/", session=FakeSession())
    assert token == "tok123"
    assert calls["url"] == "http://api:8000/api-token-auth/"
    assert calls["data"] == {"username": "alice", "password": "s3cret"}


def test_authenticate_failure_returns_none(monkeypatch):
    from videoquery.service.client import authenticate

    monkeypatch.delenv("API_CLIENT_USERNAME", raising=False)
    assert authenticate("http://api:8000/", session=object()) is None


def test_loader_cli_shard_out_no_api(tmp_path, rng):
    """loader --shard_out --no_api builds binary shards with no API client."""
    from videoquery.index.persist import load_index_binary
    from videoquery.service import loader

    root = make_csv_tree(tmp_path, rng)
    out = str(tmp_path / "shards")
    loader.main([root, "--shard_out", out, "--no_api"])
    idx = load_index_binary(out)
    assert idx.n_clips == 6
    assert idx.splits == (1, 2)


# Appendix-A contract: every coreapi action pair the reference issues
# (SURVEY.md Appendix A; call sites cited per row) and the exact
# (method, path) the client must emit for it. The fake API mirrors these
# routes, so this table — not the fake — is the recorded route contract.
APPENDIX_A_ROUTES = {
    # api_repository.py:53-63
    ("query-state", "compute-new", "list"): ("GET", "query-state/compute-new/"),
    ("query-state", "compute-revised", "list"): ("GET", "query-state/compute-revised/"),
    ("query-state", "compute-finalize", "list"): ("GET", "query-state/compute-finalize/"),
    # ticket.py:66-78,112-118,182-186,270-274
    ("queries", "read"): ("GET", "queries/{id}/"),
    ("queries", "partial_update"): ("PATCH", "queries/{id}/"),
    # api_load_records.py:20-39; ticket.py:188-190
    ("videos", "list"): ("GET", "videos/"),
    ("videos", "read"): ("GET", "videos/{id}/"),
    ("videos", "create"): ("POST", "videos/"),
    # api_load_records.py:63-88; ticket.py:256-258; target_clip.py:273-276
    ("video-clips", "list"): ("GET", "video-clips/"),
    ("video-clips", "read"): ("GET", "video-clips/{id}/"),
    ("video-clips", "create"): ("POST", "video-clips/"),
    ("video-clips", "features"): ("GET", "video-clips/{id}/features/"),
    # api_load_records.py:90-113
    ("features", "list"): ("GET", "features/"),
    ("features", "create"): ("POST", "features/"),
    # ticket.py:196-199,362-365
    ("search-sets", "read"): ("GET", "search-sets/{id}/"),
    ("search-sets", "features"): ("GET", "search-sets/{id}/features/"),
    # ticket.py:286-299,192-195
    ("query-results", "create"): ("POST", "query-results/"),
    ("query-results", "read"): ("GET", "query-results/{id}/"),
    # ticket.py:276-284,259-261; target_clip.py:117-124
    ("matches", "create"): ("POST", "matches/"),
    ("matches", "list"): ("GET", "matches/"),
}


def test_appendix_a_route_contract():
    for action, (method, path) in APPENDIX_A_ROUTES.items():
        got_method, got_path, is_detail = resolve_action(list(action))
        assert (got_method, got_path) == (method, path), action
        assert is_detail == ("{id}" in path), action


def test_route_override_escape_hatch(monkeypatch):
    """VIDEOQUERY_ROUTE_OVERRIDES remaps any action if the live API's
    router differs from the static table."""
    monkeypatch.setenv(
        "VIDEOQUERY_ROUTE_OVERRIDES",
        '{"videos.list": ["GET", "api/v2/videos/", false],'
        ' "queries.partial_update": ["PUT", "api/v2/queries/{id}/", true]}',
    )
    assert resolve_action(["videos", "list"]) == ("GET", "api/v2/videos/", False)
    assert resolve_action(["queries", "partial_update"]) == (
        "PUT", "api/v2/queries/{id}/", True)
    # unlisted actions keep the static table
    assert resolve_action(["matches", "create"]) == ("POST", "matches/", False)
