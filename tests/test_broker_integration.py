"""End-to-end broker rounds against the in-process fake API.

Exercises the full serving path of SURVEY.md §3.1: poll -> ticket -> target
-> similarities -> optimize -> query_result -> scores -> selection -> match
records -> report/finalize, including the process-state machine and the
bootstrapped-target DB-resume contract.
"""

import json
import os
import random

import numpy as np
import pytest

from videoquery.core.config import (
    HyperParams,
    STATE_ERROR,
    STATE_FINALIZED,
    STATE_PROCESSED,
)
from videoquery.service.compute_matches import compute_matches
from videoquery.service.repository import APIRepository
from videoquery.testing.fake_api import FakeAPI, FakeClient

from conftest import REFERENCE_FIXTURES as REF_ROOT
STREAMS = ("rgb", "warped_optical_flow")


def seed_from_fixture(api: FakeAPI, corpus="stock-video-clips_features"):
    """Populate the fake API from the checked-in reference CSVs."""
    from videoquery.index.csvio import read_feature_tree

    root = os.path.join(REF_ROOT, corpus)
    videos = {}
    clip_ids = {}
    for video_name, split, csvf in read_feature_tree(root):
        if video_name not in videos:
            videos[video_name] = api.add_video(csvf.video, csvf.video_url)
        video = videos[video_name]
        for clip_no, vec in zip(csvf.clip_numbers, csvf.features):
            key = (video_name, int(clip_no))
            if key not in clip_ids:
                clip_ids[key] = api.add_clip(video["id"], int(clip_no))["id"]
            api.add_feature(clip_ids[key], csvf.stream, split, vec)
    return videos, clip_ids


def make_repo(api):
    return APIRepository(FakeClient(api), "fake://")


@pytest.fixture(scope="module")
def fixture_api_template():
    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference fixtures unavailable")
    api = FakeAPI()
    videos, clip_ids = seed_from_fixture(api)
    return api, videos, clip_ids


def fresh_query(api, videos, clip_ids, dyn=False, max_matches=10):
    video = next(iter(videos.values()))
    vname = next(iter(videos))
    ref_clip_id = clip_ids[(vname, 1)]
    search = api.add_search_set(
        "all", [cid for (v, c), cid in clip_ids.items()]
    )
    return api.add_query(
        f"q{api.next_id()}", video["id"], 1, ref_clip_id, search["id"],
        max_matches_for_review=max_matches, dynamic_target_adjustment=dyn,
    )


def test_new_job_round(fixture_api_template):
    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids)
    hp = HyperParams()
    compute_matches(make_repo(api), hp, rng=random.Random(0), exact=True)

    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_PROCESSED
    results = [r for r in api.query_results.values() if r["query"] == query["id"]]
    assert len(results) == 1
    assert results[0]["round"] == 1
    assert results[0]["match_criterion"] == hp.default_threshold
    assert results[0]["weights"] == [1.0, 1.5]
    target = json.loads(results[0]["bootstrapped_target"])
    assert set(target) == set(STREAMS)
    matches = [m for m in api.matches.values()
               if m["query_result"] == results[0]["id"]]
    assert 1 <= len(matches) <= 10
    # the reference clip must be among the matches with score 1.0
    ref_id = query["ref_clip_id"]
    ref_match = [m for m in matches if m["video_clip"] == ref_id]
    assert ref_match and abs(ref_match[0]["score"] - 1.0) < 1e-9


def run_full_lifecycle(api, videos, clip_ids, dyn, bootstrap_type="bagging",
                       exact=True):
    import dataclasses

    query = fresh_query(api, videos, clip_ids, dyn=dyn)
    hp = HyperParams(bootstrap_type=bootstrap_type)
    repo = make_repo(api)
    rng = random.Random(1)

    compute_matches(repo, hp, rng=rng, exact=exact)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED

    # the user reviews: mark the ref clip + best two as matches, worst as not
    r1 = max(
        (r for r in api.query_results.values() if r["query"] == query["id"]),
        key=lambda r: r["round"],
    )
    round_matches = sorted(
        (m for m in api.matches.values() if m["query_result"] == r1["id"]),
        key=lambda m: -m["score"],
    )
    for m in round_matches[:3]:
        api.set_user_match(m["id"], True)
    api.set_user_match(round_matches[-1]["id"], False)
    api.request_revision(query["id"])

    compute_matches(repo, hp, rng=rng, exact=exact)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
    r2 = max(
        (r for r in api.query_results.values() if r["query"] == query["id"]),
        key=lambda r: r["round"],
    )
    assert r2["round"] == 2
    # optimizer ran: threshold inside the grid minus eps, weights pinned rgb=1
    assert 0.5 - 1e-5 <= r2["match_criterion"] <= 1.1
    assert r2["weights"][0] == 1.0

    # user confirms again, then finalizes
    round2_matches = sorted(
        (m for m in api.matches.values() if m["query_result"] == r2["id"]),
        key=lambda m: -m["score"],
    )
    api.set_user_match(round2_matches[0]["id"], True)
    api.request_finalize(query["id"])
    compute_matches(repo, hp, rng=rng, exact=exact)
    assert api.queries[query["id"]]["process_state"] == STATE_FINALIZED
    assert query["id"] in api.uploaded_reports
    report = api.uploaded_reports[query["id"]]
    assert "min score for a match:" in report
    assert "bootstrap type:" in report
    return query, report


def test_full_lifecycle_static_target(fixture_api_template, tmp_path, monkeypatch):
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    run_full_lifecycle(api, videos, clip_ids, dyn=False)


def test_full_lifecycle_dynamic_target_bagging(fixture_api_template, tmp_path,
                                               monkeypatch):
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    query, report = run_full_lifecycle(api, videos, clip_ids, dyn=True)
    # the finalize round's target must have been bootstrapped (differs from
    # the round-1 scaled-ref target)
    results = sorted(
        (r for r in api.query_results.values() if r["query"] == query["id"]),
        key=lambda r: r["round"],
    )
    t1 = json.loads(results[0]["bootstrapped_target"])
    t3 = json.loads(results[-1]["bootstrapped_target"])
    v1 = np.asarray(t1["rgb"][next(iter(t1["rgb"]))])
    v3 = np.asarray(t3["rgb"][next(iter(t3["rgb"]))])
    assert not np.allclose(v1, v3)


def test_fatal_error_missing_ref_clip(fixture_api_template):
    api, videos, clip_ids = fixture_api_template
    video = next(iter(videos.values()))
    search = api.add_search_set("s", list(clip_ids.values()))
    query = api.add_query("broken", video["id"], 99, None, search["id"])
    compute_matches(make_repo(api), HyperParams(), rng=random.Random(0), exact=True)
    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_ERROR
    assert "Fatal Error" in q["notes"]


def test_dynamic_downgrade_without_user_matches(fixture_api_template):
    """Revise with dynamic_target_adjustment but no user matches downgrades
    to static target with a note (ticket.py:96-107)."""
    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids, dyn=True)
    repo = make_repo(api)
    compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True)
    api.request_revision(query["id"])
    compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True)
    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_PROCESSED
    assert "Changing dynamic target adjustment to False" in q["notes"]


def test_seeded_rounds_reproducible(fixture_api_template):
    """Identical seeds must produce identical match selections
    (RANDOM_SEED contract, README.md:35-38)."""
    api, videos, clip_ids = fixture_api_template

    def run(seed):
        q = fresh_query(api, videos, clip_ids, max_matches=6)
        compute_matches(make_repo(api), HyperParams(),
                        rng=random.Random(seed), exact=True)
        r = max(
            (r for r in api.query_results.values() if r["query"] == q["id"]),
            key=lambda r: r["round"],
        )
        return sorted(
            m["video_clip"] for m in api.matches.values()
            if m["query_result"] == r["id"]
        )

    assert run(7) == run(7)


def test_search_set_cache_reuses_index(fixture_api_template):
    """Repeated rounds over the same search set must not refetch features
    when a SearchSetCache is supplied."""
    from videoquery.service.compute_matches import SearchSetCache

    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids)
    repo = make_repo(api)
    cache = SearchSetCache(ttl_seconds=3600)

    calls = {"n": 0}
    orig = FakeAPI._a_search_set_features

    def counting(self, params):
        calls["n"] += 1
        return orig(self, params)

    FakeAPI._a_search_set_features = counting
    try:
        compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True,
                        index_cache=cache)
        api.request_revision(query["id"])
        compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True,
                        index_cache=cache)
    finally:
        FakeAPI._a_search_set_features = orig
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
    assert calls["n"] == 1  # second round served from the cache


def test_search_set_cache_versionless_refetches(tmp_path, monkeypatch):
    """An API that exposes NO version-ish field on search-sets read must get
    reference semantics — refetch every round — so a search set grown
    between rounds can never serve stale candidates (VERDICT r2 #7;
    reference ticket.py:358-382 refetched unconditionally)."""
    from videoquery.service.compute_matches import SearchSetCache

    class VersionlessAPI(FakeAPI):
        def action(self, action, params=None, encoding=None):
            out = super().action(action, params, encoding)
            if tuple(action) == ("search-sets", "read"):
                out = {"id": out["id"], "name": out["name"]}
            return out

    api = VersionlessAPI()
    videos, clip_ids = seed_from_fixture(api)
    query = fresh_query(api, videos, clip_ids, max_matches=30)
    repo = make_repo(api)
    cache = SearchSetCache(ttl_seconds=3600)

    calls = {"n": 0}
    orig = FakeAPI._a_search_set_features

    def counting(self, params):
        calls["n"] += 1
        return orig(self, params)

    monkeypatch.setattr(FakeAPI, "_a_search_set_features", counting)
    monkeypatch.chdir(tmp_path)
    compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True,
                    index_cache=cache)
    assert calls["n"] == 1

    # the search set grows by a clone of the ref clip's features...
    r1 = max((r for r in api.query_results.values()
              if r["query"] == query["id"]), key=lambda r: r["round"])
    for m in sorted((m for m in api.matches.values()
                     if m["query_result"] == r1["id"]),
                    key=lambda m: -m["score"])[:2]:
        api.set_user_match(m["id"], True)
    vname = next(iter(videos))
    new_clip = api.add_clip(videos[vname]["id"], 99)
    ref_id = query["ref_clip_id"]
    for f in list(api.features.values()):
        if f["video_clip"] == ref_id:
            api.add_feature(new_clip["id"], f["dnn_stream"],
                            f["dnn_stream_split"], f["feature_vector"])
    api.search_sets[query["search_set_to_query"]]["clip_ids"].append(
        new_clip["id"])
    api.request_revision(query["id"])

    # ...and round 2 must see it (score 1.0 -> selected), via a refetch
    compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True,
                    index_cache=cache)
    assert calls["n"] == 2  # no TTL-stale cache hit
    r2 = max((r for r in api.query_results.values()
              if r["query"] == query["id"]), key=lambda r: r["round"])
    round2_clips = {m["video_clip"] for m in api.matches.values()
                    if m["query_result"] == r2["id"]}
    assert new_clip["id"] in round2_clips


def test_final_report_batches_reads(fixture_api_template, tmp_path,
                                    monkeypatch):
    """Finalize must issue O(pages) HTTP calls for the report rows — one
    paginated matches list + one batched clip list — not 2 per selected
    clip (VERDICT r2 #8; reference ticket.py:257-264)."""
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    counts: dict[tuple, int] = {}
    orig_action = FakeAPI.action

    def counting(self, action, params=None, encoding=None):
        counts[tuple(action)] = counts.get(tuple(action), 0) + 1
        return orig_action(self, action, params, encoding)

    monkeypatch.setattr(FakeAPI, "action", counting)
    query, report = run_full_lifecycle(api, videos, clip_ids, dyn=False)
    n_rows = sum(1 for l in report.splitlines()[20:] if l and l[0].isdigit())
    assert n_rows >= 2
    # per-clip reads only happen for target/bootstrap features, never for
    # report rows; with <=50 matches the report costs 1 matches-list page
    # and 1 batched clip-list call
    assert counts.get(("video-clips", "read"), 0) == 0
    assert counts.get(("video-clips", "list"), 0) == 1


def test_final_report_clip_read_fallback(fixture_api_template, tmp_path,
                                         monkeypatch):
    """APIs without an id__in list filter fall back to per-clip reads with
    byte-identical report output."""
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)

    orig_action = FakeAPI.action

    def no_id_in(self, action, params=None, encoding=None):
        if tuple(action) == ("video-clips", "list") and params and \
                "id__in" in params:
            raise KeyError("unsupported filter id__in")
        return orig_action(self, action, params, encoding)

    monkeypatch.setattr(FakeAPI, "action", no_id_in)
    query, report = run_full_lifecycle(api, videos, clip_ids, dyn=False)
    header_i = next(i for i, l in enumerate(report.splitlines())
                    if l.startswith("clip #,start time"))
    rows = [l for l in report.splitlines()[header_i + 1:] if l]
    assert rows  # rows produced via the per-clip-read fallback


def test_zero_matches_sets_error_state(fixture_api_template):
    """A threshold no clip can reach -> state 5 with the no-matches note
    (compute_matches.py:110-114). The reference clip must be OUTSIDE the
    search set (selection always re-adds an in-set ref clip,
    ticket.py:346-349)."""
    api, videos, clip_ids = fixture_api_template
    video = next(iter(videos.values()))
    vname = next(iter(videos))
    ref_clip_id = clip_ids[(vname, 1)]
    others = [cid for key, cid in clip_ids.items() if cid != ref_clip_id]
    search = api.add_search_set("no-ref", others)
    query = api.add_query("zero", video["id"], 1, ref_clip_id, search["id"])
    hp = HyperParams(default_threshold=1.5, near_miss_default=0.0)
    compute_matches(make_repo(api), hp, rng=random.Random(0), exact=True)
    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_ERROR
    assert "No matches were found" in q["notes"]


def test_final_report_format(fixture_api_template, tmp_path, monkeypatch):
    """Deep-check the finalize report against the reference layout
    (ticket.py:182-274): provenance rows, column header, rows sorted by
    descending score, match-type labels."""
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    query, report = run_full_lifecycle(api, videos, clip_ids, dyn=False)
    lines = report.splitlines()
    assert lines[0].startswith("Query:,")
    assert lines[1].startswith("Search Set queried:,")
    assert lines[2].startswith("Reference Video:,DowntownBrooklynDrive_480p")
    header_i = next(i for i, l in enumerate(lines)
                    if l.startswith("clip #,start time,match type"))
    rows = [l.split(",") for l in lines[header_i + 1:] if l]
    scores = [float(r[5]) for r in rows]
    assert scores == sorted(scores, reverse=True)
    types = {r[2] for r in rows}
    assert types <= {"user-identified match", "user-identified non-match",
                     "inferred match", "inferred non-match"}
    assert "user-identified match" in types
    # start times are h:mm:ss strings derived from match_video_time_span
    assert all(":" in r[1] for r in rows)


def test_full_lifecycle_partial_update(fixture_api_template, tmp_path,
                                       monkeypatch):
    """partial_update bootstrapping through the full lifecycle: the round-2
    target is an EMA of the fresh solve and the stored round-1 target
    (target_clip.py:75-82)."""
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    query, _ = run_full_lifecycle(api, videos, clip_ids, dyn=True,
                                  bootstrap_type="partial_update")
    results = sorted(
        (r for r in api.query_results.values() if r["query"] == query["id"]),
        key=lambda r: r["round"],
    )
    assert len(results) == 3
    t1 = json.loads(results[0]["bootstrapped_target"])
    t2 = json.loads(results[1]["bootstrapped_target"])
    s = next(iter(t1["rgb"]))
    assert not np.allclose(t1["rgb"][s], t2["rgb"][s])


def test_broker_loop_runs_and_stops(fixture_api_template):
    """Broker.run_forever processes pending jobs and stops cleanly."""
    import threading
    import time as _time

    from videoquery.core.config import BrokerConfig
    from videoquery.service.broker import Broker

    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids)
    broker = Broker(
        BrokerConfig(base_url="fake://", loop_seconds=0.05),
        client=FakeClient(api),
        exact=True,
    )
    t = threading.Thread(target=broker.run_forever)
    t.start()
    deadline = _time.time() + 30
    while (api.queries[query["id"]]["process_state"] != STATE_PROCESSED
           and _time.time() < deadline):
        _time.sleep(0.1)
    broker.stop()
    t.join(timeout=10)
    assert not t.is_alive()
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED


def test_add_note_accumulates(fixture_api_template):
    """Notes chain with blank-line separators (ticket.py:64-78)."""
    from videoquery.service.ticket import Ticket

    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids)
    update = api.action(["query-state", "compute-new", "list"])
    ticket = Ticket(update, FakeClient(api))
    ticket.add_note("first")
    ticket.add_note("second")
    assert api.queries[ticket.query_id]["notes"] == "first\n\nsecond"
    # restore state so other tests' polls don't pick this query up oddly
    api.queries[query["id"]]["process_state"] = STATE_PROCESSED


def test_full_lifecycle_device_f32_path(fixture_api_template, tmp_path,
                                        monkeypatch):
    """The serving default (f32 device similarity) through the whole
    new->revise->finalize service flow — previously only the exact=True
    float64 path was exercised end-to-end."""
    api, videos, clip_ids = fixture_api_template
    monkeypatch.chdir(tmp_path)
    run_full_lifecycle(api, videos, clip_ids, dyn=False, exact=False)


def test_device_and_exact_paths_select_identical_matches(fixture_api_template):
    """One new-job round per numerics path over the same corpus + seed: the
    f32 device path must select the same match set as the float64 path."""
    api, videos, clip_ids = fixture_api_template
    hp = HyperParams()
    selected = {}
    for exact in (True, False):
        query = fresh_query(api, videos, clip_ids)
        compute_matches(make_repo(api), hp, rng=random.Random(7), exact=exact)
        assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
        result = max(
            (r for r in api.query_results.values() if r["query"] == query["id"]),
            key=lambda r: r["round"],
        )
        ms = {m["video_clip"]: m["score"] for m in api.matches.values()
              if m["query_result"] == result["id"]}
        selected[exact] = ms
    assert set(selected[True]) == set(selected[False])
    for clip, s_exact in selected[True].items():
        assert abs(s_exact - selected[False][clip]) < 1e-4, clip


def test_search_set_cache_invalidated_when_set_grows(fixture_api_template):
    """A search set that grows between rounds must NOT serve stale
    candidates: the cache key includes a per-round version signal (one cheap
    search-set read — the reference refetched everything every round,
    ticket.py:358-382)."""
    from videoquery.service.compute_matches import SearchSetCache

    api, videos, clip_ids = fixture_api_template
    query = fresh_query(api, videos, clip_ids)
    repo = make_repo(api)
    cache = SearchSetCache(ttl_seconds=3600)
    hp = HyperParams()

    compute_matches(repo, hp, rng=random.Random(0), exact=True,
                    index_cache=cache)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED

    # a new clip — an exact copy of the reference clip — joins the search
    # set between rounds; it MUST appear as a match in the next round
    video = next(iter(videos.values()))
    ref_id = query["ref_clip_id"]
    new_clip = api.add_clip(video["id"], 9999)
    for f in [f for f in api.features.values() if f["video_clip"] == ref_id]:
        api.add_feature(new_clip["id"], f["dnn_stream"],
                        f["dnn_stream_split"], f["feature_vector"])
    api.search_sets[query["search_set_to_query"]]["clip_ids"].append(
        new_clip["id"])

    api.request_revision(query["id"])
    compute_matches(repo, hp, rng=random.Random(0), exact=True,
                    index_cache=cache)
    result = max(
        (r for r in api.query_results.values() if r["query"] == query["id"]),
        key=lambda r: r["round"],
    )
    clips = {m["video_clip"] for m in api.matches.values()
             if m["query_result"] == result["id"]}
    assert new_clip["id"] in clips  # stale cache would miss it
