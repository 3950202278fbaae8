"""State-3 job lease recovery (service/lease.py).

The reference flaw (SURVEY.md §5.3): compute_matches PATCHes a query to
state 3 and a broker crash before the terminal PATCH strands it forever —
the poll endpoints only serve states 1/2/6. These tests kill a broker
mid-job (client raises after the state-3 PATCH + lease stamp) and assert
the next poll's recovery pass resets and re-processes the query.
"""

import random
import time

import pytest

from videoquery.core.config import (
    BrokerConfig,
    HyperParams,
    STATE_IN_PROGRESS,
    STATE_PROCESSED,
)
from videoquery.service import lease
from videoquery.service.compute_matches import compute_matches
from videoquery.service.lease import LeaseRecovery
from videoquery.service.repository import APIRepository
from videoquery.testing.fake_api import (
    FakeAPI,
    FakeClient,
    STATE_NEW_REQUESTED,
    STATE_REVISE_REQUESTED,
)

from test_broker_integration import fresh_query, seed_from_fixture


class CrashingClient(FakeClient):
    """Raises (simulating a killed broker process) on the first call of the
    given action — placed after the state-3 PATCH in the job flow."""

    def __init__(self, api, crash_on=("search-sets", "features")):
        super().__init__(api)
        self.crash_on = tuple(crash_on)
        self.crashed = False

    def action(self, action, params=None, encoding=None):
        if tuple(action) == self.crash_on and not self.crashed:
            self.crashed = True
            raise RuntimeError("broker killed mid-job")
        return super().action(action, params, encoding)


@pytest.fixture()
def api_world():
    import os

    from conftest import REFERENCE_FIXTURES as REF_ROOT

    if not os.path.isdir(REF_ROOT):
        pytest.skip("reference fixtures unavailable")
    api = FakeAPI()
    videos, clip_ids = seed_from_fixture(api)
    return api, videos, clip_ids


def crash_mid_job(api):
    """Run one poll against a client that dies mid-job; the query must be
    left in state 3 with a lease breadcrumb (what a real kill leaves).
    compute_matches contains the failure (logs it, processes other jobs) —
    the contract under test is only the state it leaves behind."""
    client = CrashingClient(api)
    repo = APIRepository(client, "fake://")
    compute_matches(repo, HyperParams(), rng=random.Random(0), exact=True)


def test_crashed_new_job_recovered_and_reprocessed(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    crash_mid_job(api)
    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_IN_PROGRESS
    assert "[lease] processing new since" in q["notes"]

    # a fresh broker (no shared memory with the dead one) polls later
    client = FakeClient(api)
    rec = LeaseRecovery(client, lease_seconds=300.0)
    # within the lease: left alone
    assert rec.recover(now=time.time() + 10) == []
    assert api.queries[query["id"]]["process_state"] == STATE_IN_PROGRESS
    # past the lease: reset to its requesting state with an audit note
    assert rec.recover(now=time.time() + 301) == [query["id"]]
    q = api.queries[query["id"]]
    assert q["process_state"] == STATE_NEW_REQUESTED
    assert "[lease] reset to state 1" in q["notes"]

    # ...and the next ordinary poll picks it up and completes it
    compute_matches(APIRepository(client, "fake://"), HyperParams(),
                    rng=random.Random(0), exact=True)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
    assert any(r["query"] == query["id"] for r in api.query_results.values())


def test_crashed_revise_job_resets_to_revise_state(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    client = FakeClient(api)
    compute_matches(APIRepository(client, "fake://"), HyperParams(),
                    rng=random.Random(0), exact=True)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
    # user reviews some matches and requests a revision; broker dies mid-way
    for m in list(api.matches.values())[:3]:
        api.set_user_match(m["id"], True)
    api.request_revision(query["id"])
    crash_mid_job(api)
    assert api.queries[query["id"]]["process_state"] == STATE_IN_PROGRESS

    rec = LeaseRecovery(client, lease_seconds=60.0)
    assert rec.recover(now=time.time() + 61) == [query["id"]]
    assert api.queries[query["id"]]["process_state"] == STATE_REVISE_REQUESTED

    n_rounds = sum(r["query"] == query["id"]
                   for r in api.query_results.values())
    compute_matches(APIRepository(client, "fake://"), HyperParams(),
                    rng=random.Random(0), exact=True)
    assert api.queries[query["id"]]["process_state"] == STATE_PROCESSED
    assert sum(r["query"] == query["id"]
               for r in api.query_results.values()) == n_rounds + 1


def test_recovery_is_idempotent_across_brokers(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    crash_mid_job(api)
    client = FakeClient(api)
    now = time.time() + 1000
    assert LeaseRecovery(client, 60.0).recover(now=now) == [query["id"]]
    # a second broker racing the same expired lease finds nothing in state 3
    assert LeaseRecovery(client, 60.0).recover(now=now) == []
    assert api.queries[query["id"]]["process_state"] == STATE_NEW_REQUESTED


def test_stamp_replaces_previous_stamp(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    client = FakeClient(api)
    lease.stamp(client, query["id"], "new", now=1000.0)
    lease.stamp(client, query["id"], "revise", now=2000.0)
    notes = api.queries[query["id"]]["notes"]
    assert notes.count("[lease] processing") == 1
    assert "revise since 2000" in notes


def test_no_breadcrumb_falls_back_to_first_seen_clock(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    # a foreign writer (or pre-lease broker) strands the job without a stamp
    api.queries[query["id"]]["process_state"] = STATE_IN_PROGRESS
    client = FakeClient(api)
    rec = LeaseRecovery(client, lease_seconds=100.0)
    t0 = time.time()
    assert rec.recover(now=t0) == []          # starts the clock
    assert rec.recover(now=t0 + 50) == []     # not yet expired
    assert rec.recover(now=t0 + 101) == [query["id"]]
    # no query_results -> it was a new job
    assert api.queries[query["id"]]["process_state"] == STATE_NEW_REQUESTED


def test_lease_disabled_leaves_state_3_alone(api_world):
    api, videos, clip_ids = api_world
    query = fresh_query(api, videos, clip_ids)
    crash_mid_job(api)
    rec = LeaseRecovery(FakeClient(api), lease_seconds=0.0)
    assert rec.recover(now=time.time() + 1e6) == []
    assert api.queries[query["id"]]["process_state"] == STATE_IN_PROGRESS


def test_broker_config_lease_env(monkeypatch):
    monkeypatch.setenv("BROKER_LEASE_SECONDS", "42.5")
    assert BrokerConfig.from_env().lease_seconds == 42.5


def test_missing_list_route_warns_once_and_disables(caplog):
    """An API without the `queries list?process_state=` route (the one
    route lease recovery needs beyond the reference surface — SURVEY.md
    Appendix A, docs/PARITY.md) degrades to recovery-off with ONE visible
    WARNING, not silence (round-4 VERDICT #8)."""
    import logging

    class NoListClient:
        def action(self, action, params=None, encoding=None):
            if tuple(action) == ("queries", "list"):
                raise KeyError("no such route")
            raise AssertionError("recovery must only probe queries/list")

    rec = LeaseRecovery(NoListClient(), lease_seconds=300.0)
    with caplog.at_level(logging.WARNING, logger="videoquery.service.lease"):
        assert rec.recover(now=1000.0) == []
        assert rec.recover(now=2000.0) == []
    warnings = [r for r in caplog.records
                if "lease recovery disabled" in r.getMessage()]
    assert len(warnings) == 1
    assert "process_state" in warnings[0].getMessage()
