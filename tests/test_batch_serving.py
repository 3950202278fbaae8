"""Batched multi-query serving: bit-identity with one-job-per-poll.

The broker drains EVERY pending job per poll and scores concurrent queries
over the same search set in one device program
(service/compute_matches.py, SearchEngine.compute_similarities_multi).
The reference's poll shape is one job per type per 5 s
(api_repository.py:53-63, broker.py:87). Contract under test: the batched
poll's per-query outputs — query_results, match rows with exact float
scores, bootstrapped targets, notes, final reports — are BIT-IDENTICAL to
processing the same pending set one job per poll.
"""

import re
import types

import numpy as np
import pytest

from videoquery.core.config import (
    HyperParams,
    STATE_FINALIZED,
    STATE_PROCESSED,
)
import importlib

# the service package re-exports the compute_matches FUNCTION under the
# module's own name; go through importlib to monkeypatch the module
cm = importlib.import_module("videoquery.service.compute_matches")
compute_matches = cm.compute_matches
from videoquery.service.repository import APIRepository
from videoquery.testing.fake_api import FakeAPI, FakeClient

STREAMS = ("rgb", "warped_optical_flow")
SEED = 1234
N_CLIPS = 160
DIM = 24
PENDING_STATES = (1, 2, 6)


class CountingClient(FakeClient):
    """FakeClient that counts actions, to prove grouping/batching."""

    def __init__(self, api):
        super().__init__(api)
        self.counts: dict[tuple, int] = {}

    def action(self, action, params=None, encoding=None):
        key = tuple(action)
        self.counts[key] = self.counts.get(key, 0) + 1
        return super().action(action, params, encoding)


def _cone_vector(rng, u, theta):
    """Unit vector at angle theta from unit vector u."""
    w = rng.standard_normal(u.shape[0])
    w -= w @ u * u
    w /= np.linalg.norm(w)
    return np.cos(theta) * u + np.sin(theta) * w


def build_world(n_queries=9, n_new_later=2, second_set=False):
    """Deterministic world: one shared search set, n_queries queries whose
    round 1 is already processed, then a mixed pending batch (revises,
    finalizes, and brand-new queries)."""
    rng = np.random.default_rng(7)
    api = FakeAPI()
    video = api.add_video("vid", "")
    u = rng.standard_normal(DIM)
    u /= np.linalg.norm(u)
    clip_ids = []
    # clips fan out on a cone around u: scores spread across the match and
    # near-miss bands so selection (incl. its random.sample) is exercised
    thetas = np.linspace(0.0, 1.3, N_CLIPS)
    for i in range(N_CLIPS):
        c = api.add_clip(video["id"], i + 1)
        clip_ids.append(c["id"])
        for s in STREAMS:
            for split in (1, 2, 3):
                jitter = 0.03 * rng.standard_normal()
                api.add_feature(c["id"], s, split,
                                _cone_vector(rng, u, thetas[i] + jitter))
    search = api.add_search_set("shared", clip_ids)
    search2 = None
    if second_set:
        search2 = api.add_search_set("shared-2", clip_ids[: N_CLIPS // 2])

    queries = []
    for qi in range(n_queries):
        sset = search2 if (second_set and qi % 3 == 2) else search
        q = api.add_query(
            f"q{api.next_id()}", video["id"], qi + 1, clip_ids[qi],
            sset["id"], max_matches_for_review=6,
            dynamic_target_adjustment=qi % 3 == 1,
        )
        queries.append(q)

    # round 1 for everyone (identical in both worlds: same seed, all-new)
    run_until_drained(api)
    for q in queries:
        assert api.queries[q["id"]]["process_state"] == STATE_PROCESSED, (
            api.queries[q["id"]]["notes"])

    # user feedback + the mixed pending batch
    for qi, q in enumerate(queries):
        result = max((r for r in api.query_results.values()
                      if r["query"] == q["id"]), key=lambda r: r["round"])
        ms = sorted((m for m in api.matches.values()
                     if m["query_result"] == result["id"]),
                    key=lambda m: m["video_clip"])
        for m, val in zip(ms[:3], (True, True, False)):
            api.set_user_match(m["id"], val)
        if qi < 5:
            api.request_revision(q["id"])
        else:
            api.request_finalize(q["id"])
    for qi in range(n_new_later):
        api.add_query(
            f"q{api.next_id()}", video["id"], 40 + qi,
            clip_ids[40 + qi], search["id"], max_matches_for_review=6,
        )
    return api


def _n_pending(api):
    return sum(q["process_state"] in PENDING_STATES
               for q in api.queries.values())


def run_until_drained(api, max_jobs_per_poll=64, client=None):
    """Poll the broker path until no job is pending; returns #polls."""
    import tempfile

    client = client or FakeClient(api)
    repo = APIRepository(client, "fake://")
    report_dir = tempfile.mkdtemp(prefix="vq_reports_")
    polls = 0
    while _n_pending(api) and polls < 50:
        compute_matches(repo, HyperParams(), seed=SEED,
                        report_dir=report_dir,
                        max_jobs_per_poll=max_jobs_per_poll)
        polls += 1
    assert _n_pending(api) == 0
    return polls


_TS = re.compile(r"since \d+ \(\d{4}-\d{2}-\d{2}T[\d:]+Z\)")
_REPORT_TS = re.compile(r"\d{2}-\d{2}-\d{4}_\d{2}h\d{2}m\d{2}s")


def _norm(text):
    return _REPORT_TS.sub("TS", _TS.sub("since TS", text or ""))


def snapshot(api):
    """Order/id-independent view of every query's externally visible
    output. Floats are NOT rounded — score equality must be bitwise."""
    out = {}
    for q in api.queries.values():
        rounds = sorted((r for r in api.query_results.values()
                         if r["query"] == q["id"]), key=lambda r: r["round"])
        per_round = []
        for r in rounds:
            ms = sorted(
                (m["video_clip"], m["score"], m["user_match"], m["is_match"])
                for m in api.matches.values()
                if m["query_result"] == r["id"]
            )
            per_round.append((r["round"], r["match_criterion"],
                              tuple(r["weights"]), r["bootstrapped_target"],
                              tuple(ms)))
        out[q["name"]] = (
            q["process_state"],
            _norm(q["notes"]),
            tuple(per_round),
            _norm(api.uploaded_reports.get(q["id"])),
        )
    return out


def test_batched_poll_bit_identical_to_sequential():
    """>= 8 concurrent jobs (5 revise + 4 finalize/new mixed): one batched
    poll == one-job-per-poll, bitwise."""
    seq = build_world()
    bat = build_world()
    assert snapshot(seq) == snapshot(bat)  # identical starting worlds

    polls = run_until_drained(seq, max_jobs_per_poll=1)
    assert polls == 11  # 9 revise/finalize + 2 new, one per poll

    client = CountingClient(bat)
    polls = run_until_drained(bat, client=client)
    assert polls == 1  # everything drained and processed in ONE poll
    # one search set + identical splits -> ONE group -> one feature fetch
    assert client.counts[("search-sets", "features")] == 1

    assert snapshot(seq) == snapshot(bat)
    # sanity: the batch really contained finalized and processed queries
    states = [q["process_state"] for q in bat.queries.values()]
    assert states.count(STATE_FINALIZED) == 4
    assert states.count(STATE_PROCESSED) == 7


def test_batched_poll_resident_path_bit_identical(monkeypatch):
    """Same contract through the big-corpus ResidentTable path (banded
    candidate downloads instead of full tables)."""
    monkeypatch.setattr(
        cm, "SearchConfig",
        lambda: types.SimpleNamespace(big_round_threshold=100))
    seq = build_world()
    bat = build_world()
    run_until_drained(seq, max_jobs_per_poll=1)
    run_until_drained(bat)
    assert snapshot(seq) == snapshot(bat)


def test_mixed_search_sets_grouped_separately():
    """Jobs over different search sets form separate groups but still drain
    in one poll, and results match sequential processing."""
    seq = build_world(second_set=True)
    bat = build_world(second_set=True)
    run_until_drained(seq, max_jobs_per_poll=1)
    client = CountingClient(bat)
    assert run_until_drained(bat, client=client) == 1
    assert client.counts[("search-sets", "features")] == 2  # two groups
    assert snapshot(seq) == snapshot(bat)


def test_one_similarity_program_per_group(monkeypatch):
    """The Q concurrent queries of a group are scored by ONE batched device
    program (the VERDICT 'one device program, not N polls' criterion)."""
    calls = []
    real = cm.SearchEngine.compute_similarities_multi

    def spy(self, targets, resident=False):
        calls.append(len(targets))
        return real(self, targets, resident)

    api = build_world()  # (round 1 is processed before the spy attaches)
    monkeypatch.setattr(cm.SearchEngine, "compute_similarities_multi", spy)
    run_until_drained(api)
    assert calls == [11]  # one program, Q=11


def test_fatal_job_in_batch_does_not_poison_others():
    api = build_world(n_new_later=0)
    # corrupt one pending revise: drop its ref clip (fatal per
    # ticket.catch_errors / reference ticket.py:86-94)
    victim = next(q for q in api.queries.values() if q["process_state"] == 2)
    victim["ref_clip_id"] = None
    run_until_drained(api)
    assert api.queries[victim["id"]]["process_state"] == 5
    assert "Fatal Error" in api.queries[victim["id"]]["notes"]
    others = [q for q in api.queries.values() if q["id"] != victim["id"]]
    assert all(q["process_state"] in (STATE_PROCESSED, STATE_FINALIZED)
               for q in others)


def test_seeded_results_independent_of_drain_cap():
    """seed-derived per-job PRNGs: processing 3 jobs per poll (a partial
    batch) gives the same bits as 1 or all."""
    a = build_world()
    b = build_world()
    run_until_drained(a, max_jobs_per_poll=3)
    run_until_drained(b)
    assert snapshot(a) == snapshot(b)
