"""Match-computation orchestrator — the serving path of the framework.

Mirrors the reference control flow (compute_matches.py:8-114) with the math
swapped for the batched device engine: per pending job, build the ticket,
estimate the target, run one similarity program over the whole search set,
optimize hyperparameters on revise/finalize, persist the round, select clips
for review, and report/finalize.
"""

from __future__ import annotations

import logging
import random
from typing import Any, Mapping

from videoquery.core.config import (
    HyperParams,
    STATE_FINALIZED,
    STATE_IN_PROGRESS,
    STATE_PROCESSED,
    SearchConfig,
    compute_eps,
)
from videoquery.index.store import FeatureIndex
from videoquery.search.engine import SearchEngine
from videoquery.search.selection import (
    INFINITE_MATCHES,
    finalize_near_miss,
    lowest_scoring_user_match,
    select_clips_to_review,
)
from videoquery.search.target import TargetEstimator
from videoquery.service import lease
from videoquery.service.repository import APIRepository
from videoquery.service.ticket import Ticket

log = logging.getLogger(__name__)


class SearchSetCache:
    """Device-resident index cache keyed by search-set id.

    The reference refetches and re-parses the ENTIRE search set's features
    from the API on every round of every query (ticket.py:358-382 — the
    dominant cost of a revise round at scale). Rounds of the same query (and
    different queries over the same search set) reuse the device index,
    keyed by the search set's version signal — an API that exposes no
    version-ish field gets reference semantics (refetch every round, the
    cache is bypassed in process_job) so a grown search set can never serve
    stale candidates. The TTL additionally bounds staleness for versioned
    sets whose signal might lag (e.g. a coarse updated_at)."""

    def __init__(self, ttl_seconds: float = 300.0, max_entries: int = 4):
        self.ttl = ttl_seconds
        self.max_entries = max_entries
        self._entries: dict[tuple, tuple[float, FeatureIndex]] = {}

    def get(self, key: tuple, build) -> FeatureIndex:
        import time

        now = time.monotonic()
        hit = self._entries.get(key)
        if hit is not None and now - hit[0] < self.ttl:
            return hit[1]
        index = build()
        if len(self._entries) >= self.max_entries:
            oldest = min(self._entries, key=lambda k: self._entries[k][0])
            del self._entries[oldest]
        self._entries[key] = (now, index)
        return index


def compute_matches(
    query_updates: APIRepository,
    hyperparameters: HyperParams,
    *,
    rng: random.Random | None = None,
    report_dir: str = "final_reports",
    exact: bool = False,
    index_cache: SearchSetCache | None = None,
) -> None:
    """Process every pending job this poll (reference compute_matches.py:8).

    exact=True runs the float64 host similarity path (reference-parity
    numerics); default is the f32 device path. index_cache (optional)
    reuses device indexes across rounds of the same search set.
    """
    updates_needed = query_updates.get_status()
    if updates_needed is None:
        return

    for update_type, update_object in updates_needed.items():
        if update_object is None:
            continue
        ticket = Ticket(update_object, query_updates.client, report_dir)
        ticket.change_process_state(STATE_IN_PROGRESS)
        # lease breadcrumb: lets a later poll detect and reset this job if
        # the broker dies before the terminal PATCH (service/lease.py; the
        # reference left such jobs in state 3 forever, SURVEY.md §5.3)
        try:
            lease.stamp(query_updates.client, ticket.query_id, update_type)
        except Exception as exc:  # the stamp must never kill the job itself
            log.warning("lease stamp failed for query %s: %s",
                        ticket.query_id, exc)

        fatal_error_message, error_message = ticket.catch_errors(update_type)
        if fatal_error_message:
            ticket.fail(fatal_error_message)
            continue
        if error_message:
            ticket.add_note(error_message)

        process_job(ticket, update_type, update_object, hyperparameters,
                    rng=rng, exact=exact, index_cache=index_cache)


def process_job(
    ticket: Ticket,
    update_type: str,
    update_object: Mapping[str, Any],
    hp: HyperParams,
    *,
    rng: random.Random | None = None,
    exact: bool = False,
    index_cache: SearchSetCache | None = None,
) -> None:
    # -- target estimation (reference compute_matches.py:55-56) --------------
    ref_features, ref_splits = ticket.clip_features(ticket.ref_clip_id, hp)
    estimator = TargetEstimator(hp, rng=rng)
    bootstrap = bool(ticket.dynamic_target_adjustment)
    previous_target = None
    valid_feats: list = []
    invalid_feats: list = []
    target_splits = ref_splits
    if ticket.latest_query_result:
        previous_target = ticket.latest_query_result.get("bootstrapped_target")
    if bootstrap and previous_target is not None:
        valid_feats, match_splits = ticket.match_features(True, hp)
        invalid_feats, _ = ticket.match_features(False, hp)
        if valid_feats:
            target_splits = match_splits
    ticket.target_features = estimator.estimate(
        ref_features, valid_feats, invalid_feats, target_splits,
        previous_target, bootstrap,
    )

    # -- one similarity program over the search set (ticket.py:120-163) -------
    def build_index() -> FeatureIndex:
        records = ticket.candidate_feature_records(hp)
        # Pad the clip axis to a coarse multiple so XLA compiles one program
        # per size bucket instead of one per exact search-set size (first
        # compile on a TPU costs tens of seconds over a tunneled chip).
        return FeatureIndex.build(
            records, hp.streams, splits=sorted(ref_splits),
            keep_host=exact, pad_multiple=512,
        )

    version = (ticket.search_set_version()
               if index_cache is not None else None)
    if index_cache is not None and version is not None:
        # version-keyed: a search set that grew between rounds changes its
        # version (one cheap read), so stale candidates are never served
        key = (ticket.search_set, version,
               tuple(hp.streams), tuple(sorted(ref_splits)),
               hp.feature_name, exact)
        index = index_cache.get(key, build_index)
    else:
        # no version signal -> reference semantics: refetch every round
        # (ticket.py:358-382); a TTL-stale index must never be served
        index = build_index()
    engine = SearchEngine(index, exact=exact)
    # Big search sets keep the similarity table on device and download only
    # the banded candidates (engine.ResidentTable) — selection-identical to
    # the full path by construction; small sets take the simpler one-shot
    # table download.
    big = (not exact
           and index.n_padded >= SearchConfig().big_round_threshold)
    table = None
    resident = None
    if big:
        resident = engine.compute_similarities_resident(ticket.target_features)
    else:
        table = engine.compute_similarities(ticket.target_features)

    # -- hyperparameter round state (compute_matches.py:61-67) ---------------
    if update_type == "new" or not update_object["matches"]:
        hp_round = hp.reset_round_state()
    elif update_type in ("revise", "finalize"):
        reviewed = {}
        for match in ticket.prior_matches:
            label = match["user_match"]
            if label is None:
                label = match["is_match"]
            reviewed[match["video_clip"]] = float(bool(label))
        hp_round, _grid = (resident or table).optimize(reviewed, hp)
    else:
        raise Exception("update type is invalid")

    # -- persist round, score, select (compute_matches.py:70-89) -------------
    new_round = 1 if update_type == "new" else ticket.latest_query_result["round"] + 1
    new_result_id = ticket.create_query_result(new_round, hp_round)

    if resident is not None:
        user_match_ids = [int(c) for c, v in ticket.user_matches.items()
                          if v is True]
        keep_ids = [ticket.ref_clip_id] + user_match_ids
        scores = resident.round_scores(
            hp_round.weights, hp_round.threshold, hp_round.near_miss_default,
            keep_ids, user_match_ids,
            finalize=update_type == "finalize",
        )
        if scores is None:  # band wider than every cap: full download
            table = resident.to_table()
            scores = table.scores(hp_round.weights)
        ticket.scores = scores
    else:
        ticket.scores = table.scores(hp_round.weights)
    if update_type == "finalize":
        max_number_matches = INFINITE_MATCHES
        low_score, _ = lowest_scoring_user_match(ticket.scores, ticket.user_matches)
        near_miss = finalize_near_miss(hp_round.threshold, low_score, compute_eps())
    else:
        max_number_matches = ticket.number_of_matches_to_review
        near_miss = hp_round.near_miss_default
    ticket.matches = select_clips_to_review(
        ticket.scores, ticket.user_matches, ticket.ref_clip_id,
        hp_round.threshold, max_number_matches, near_miss, rng=rng,
    )

    if not ticket.matches:
        catch_no_matches_error(ticket)
        return

    ticket.add_matches_to_database(new_result_id)

    if update_type == "finalize":
        ticket.create_final_report(hp_round, new_result_id)
        ticket.change_process_state(STATE_FINALIZED)
    else:
        ticket.change_process_state(STATE_PROCESSED)


def catch_no_matches_error(ticket: Ticket) -> None:
    """Zero matches is a job-level error (compute_matches.py:110-114)."""
    mround = (
        ticket.latest_query_result["round"] if ticket.latest_query_result else 1
    )
    ticket.fail(
        "*** Error: No matches were found for round {} of query {}! ***".format(
            mround, ticket.query_id
        )
    )
