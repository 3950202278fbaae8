"""Job ticket: per-query state + API I/O.

The reference Ticket (ticket.py:16-400) mixes job state, the similarity /
scoring math, and HTTP plumbing. Here the math lives in videoquery.search
(batched, on device); Ticket keeps the job state machine and the API record
traffic, with identical externally visible behavior (notes, process states,
query_result / match records, final CSV report).
"""

from __future__ import annotations

import csv
import json
import logging
import os
from datetime import datetime, timedelta
from typing import Any, Mapping

import numpy as np

from videoquery.core.config import (
    HyperParams,
    STATE_ERROR,
)
from videoquery.index.store import FeatureRecord
from videoquery.service.client import ActionClient

log = logging.getLogger(__name__)


class Ticket:
    """One pending job, built from the API's update_object (the payload shape
    documented at reference ticket.py:17-57)."""

    def __init__(self, update_object: Mapping[str, Any], client: ActionClient,
                 report_dir: str = "final_reports"):
        self.client = client
        self.report_dir = report_dir
        self.query_id = update_object["query_id"]
        self.video_id = update_object["video_id"]
        self.ref_clip = update_object["ref_clip"]
        self.ref_clip_id = update_object["ref_clip_id"]
        self.search_set = update_object["search_set"]
        self.number_of_matches_to_review = update_object["number_of_matches_to_review"]
        self.dynamic_target_adjustment = update_object["dynamic_target_adjustment"]
        self.latest_query_result = update_object.get("latest_query_result")
        self.prior_matches = update_object.get("matches") or []
        self.user_matches: dict[str, bool | None] = update_object.get("user_matches") or {}
        # round outputs
        self.target_features: dict | None = None
        self._target_splits: set | None = None  # ref-clip splits, set by
        # compute_matches.estimate_target (keys the group's index build)
        self.scores: dict[int, float] = {}
        self.matches: dict[int, float] = {}

    # -- state machine -------------------------------------------------------

    def add_note(self, note: str) -> None:
        """Append to the query's notes field (reference ticket.py:64-78)."""
        current = self.client.action(["queries", "read"], {"id": self.query_id})
        notes = current.get("notes")
        new_notes = notes + "\n\n" + note if notes else note
        self.client.action(
            ["queries", "partial_update"], {"id": self.query_id, "notes": new_notes}
        )

    def change_process_state(self, process_state: int, message: str | None = None) -> int:
        result = self.client.action(
            ["queries", "partial_update"],
            {"id": self.query_id, "process_state": process_state},
        )
        if message:
            self.add_note(message)
        return result["process_state"]

    def catch_errors(self, job_type: str) -> tuple[str, str]:
        """Error taxonomy (reference ticket.py:80-110): returns
        (fatal_message, recoverable_message). Recoverable: dynamic target
        adjustment without user matches is downgraded in place."""
        fatal, recoverable = [], []
        if self.ref_clip_id is None:
            fatal.append(
                "*** Fatal Error: A video clip corresponding to the reference "
                "time does not exist in the database. ***"
            )
        if job_type != "new" and not self.prior_matches:
            fatal.append(
                "*** Fatal Error: This is not a new query but there are 0 "
                "matches computed for the previous round. Cannot update "
                "without matches. Check database consistency for this query"
            )
        if job_type != "new" and self.dynamic_target_adjustment is True:
            if not any(m.get("user_match") is True for m in self.prior_matches):
                recoverable.append(
                    "*** Error: Dynamic target adjustment is True but there "
                    "are no user matches provided for the previous round. "
                    "Changing dynamic target adjustment to False"
                )
                self.dynamic_target_adjustment = False
        return "\n".join(fatal), "\n".join(recoverable)

    def fail(self, message: str) -> None:
        self.change_process_state(STATE_ERROR, message=message)

    # -- feature traffic ------------------------------------------------------

    def candidate_feature_records(self, hp: HyperParams) -> list[FeatureRecord]:
        """Fetch every feature row of the search set in one call
        (reference ticket.py:358-382) as FeatureRecords for the index."""
        features = self.client.action(
            ["search-sets", "features"], {"id": self.search_set}
        )
        records = []
        for tf in features:
            if (
                tf["dnn_stream_id"] in hp.streams
                and tf["name"] == hp.feature_name
            ):
                records.append(
                    FeatureRecord(
                        clip_id=tf["video_clip_id"],
                        stream=tf["dnn_stream_id"],
                        split=tf["dnn_stream_split"],
                        name=tf["name"],
                        vector=np.asarray(tf["feature_vector"], np.float64),
                    )
                )
        return records

    def search_set_version(self):
        """Cheap per-round staleness signal for the index cache: one
        search-set read (the reference refetched the whole feature set every
        round, ticket.py:358-382; we only refetch when this changes). Uses
        whatever version-ish field the API exposes. Returns None when the
        API exposes no usable signal — the caller (compute_matches.
        process_job) then bypasses the cache entirely and refetches every
        round, matching reference semantics; None must NOT be treated as
        a cacheable version."""
        try:
            row = self.client.action(
                ["search-sets", "read"], {"id": self.search_set}
            )
            for key in ("updated_at", "etag", "feature_count", "version"):
                if row.get(key) is not None:
                    return row[key]
            for key in ("clip_ids", "video_clips", "clips"):
                if isinstance(row.get(key), (list, tuple)):
                    return len(row[key])
        except Exception:  # noqa: BLE001 — version signal is best-effort;
            pass           # a non-dict payload must not abort the job
        return None

    def clip_features(self, clip_id: int, hp: HyperParams) -> tuple[dict, set[int]]:
        """{stream: {split: vector}} for one clip + its splits
        (reference target_clip.py:263-286)."""
        rows = self.client.action(["video-clips", "features"], {"id": clip_id})
        out: dict[str, dict[int, list]] = {s: {} for s in hp.streams}
        splits: set[int] = set()
        for row in rows:
            if row["dnn_stream_id"] in hp.streams and row["name"] == hp.feature_name:
                splits.add(row["dnn_stream_split"])
                out[row["dnn_stream_id"]][row["dnn_stream_split"]] = row["feature_vector"]
        return out, splits

    def match_features(self, user_match_value: bool, hp: HyperParams) -> tuple[list, set[int]]:
        """Features of all prior-round matches with the given user_match value
        (paginated matches list; reference target_clip.py:105-135)."""
        page: int | None = 1
        matches: list[dict] = []
        while page is not None:
            results = self.client.action(
                ["matches", "list"],
                {"query_result": self.latest_query_result["id"], "page": page},
            )
            matches.extend(results["results"])
            page = results["pagination"]["nextPage"]
        features, splits = [], set()
        for match in matches:
            if match["user_match"] is user_match_value:
                fdict, fsplits = self.clip_features(match["video_clip"], hp)
                features.append(fdict)
                splits.update(fsplits)
        return features, splits

    def _all_matches(self, query_result_id: int) -> list[dict]:
        """Every match row of one query_result via the paginated list."""
        page: int | None = 1
        rows: list[dict] = []
        while page is not None:
            res = self.client.action(
                ["matches", "list"],
                {"query_result": query_result_id, "page": page},
            )
            rows.extend(res["results"])
            page = res["pagination"]["nextPage"]
        return rows

    def _read_clips(self, clip_ids: list[int]) -> dict[int, dict]:
        """Clip rows for a set of ids: one batched list call where the API
        supports an id__in filter, else one read per clip (the reference's
        only available access pattern, ticket.py:256-258)."""
        try:
            res = self.client.action(
                ["video-clips", "list"],
                {"id__in": ",".join(str(c) for c in sorted(clip_ids))},
            )
            rows = {r["id"]: r for r in res["results"]}
            if all(cid in rows for cid in clip_ids):
                return rows
        except Exception:  # noqa: BLE001 — APIs without the filter fall back
            pass
        return {
            cid: self.client.action(["video-clips", "read"], {"id": cid})
            for cid in clip_ids
        }

    # -- round outputs ---------------------------------------------------------

    def create_query_result(self, nround: int, hp: HyperParams) -> int:
        """Persist the round's tuning state; the bootstrapped target is
        JSON-embedded exactly like the reference (ticket.py:286-299) so the
        next round can resume from the DB (SURVEY.md §5.4)."""
        result = self.client.action(
            ["query-results", "create"],
            {
                "round": nround,
                "match_criterion": hp.threshold,
                "weights": [hp.weights[s] for s in hp.streams],
                "query": self.query_id,
                "bootstrapped_target": json.dumps(self.target_features),
            },
        )
        return result["id"]

    def add_matches_to_database(self, new_result_id: int) -> None:
        """One match record per selected clip (reference ticket.py:59-62,
        276-284), carrying forward any user evaluation."""
        for video_clip, score in self.matches.items():
            self.client.action(
                ["matches", "create"],
                {
                    "query_result": new_result_id,
                    "score": score,
                    "user_match": self.user_matches.get(str(video_clip)),
                    "video_clip": video_clip,
                },
            )

    def create_final_report(self, hp: HyperParams, query_result_id: int) -> str:
        """Final CSV report with full hyperparameter provenance and one row
        per selected clip sorted by descending score, uploaded as a multipart
        file (reference ticket.py:182-274). Returns the local file path."""
        query = self.client.action(["queries", "read"], {"id": self.query_id})
        video = self.client.action(["videos", "read"], {"id": self.video_id})
        query_result = self.client.action(
            ["query-results", "read"], {"id": query_result_id}
        )
        search_set = self.client.action(
            ["search-sets", "read"], {"id": query["search_set_to_query"]}
        )
        number_of_reviews = query_result["round"] - 1

        os.makedirs(self.report_dir, exist_ok=True)
        file_name = "final_report_query_{}_{}.csv".format(
            query["name"], datetime.now().strftime("%m-%d-%Y_%Hh%Mm%Ss")
        )
        path = os.path.join(self.report_dir, file_name)
        with open(path, "x", newline="") as csvfile:
            w = csv.writer(csvfile)
            w.writerow(["Query:", query["name"], "Query pk:", self.query_id])
            w.writerow(["Search Set queried:", search_set["name"],
                        "Search set pk:", search_set["id"]])
            w.writerow(["Reference Video:", video["name"], "Video pk:", self.video_id])
            w.writerow(["Reference time:", query["reference_time"]])
            w.writerow(["number of reviews:", number_of_reviews])
            w.writerow(["min score for a match:", query_result["match_criterion"]])
            w.writerow(["max matches to review:", query["max_matches_for_review"]])
            w.writerow(["streams:", str(tuple(hp.streams))])
            w.writerow(["stream weights:", str(query_result["weights"])])
            w.writerow(["Target bootstrapping:", query["use_dynamic_target_adjustment"]])
            w.writerow(["query notes:", query["notes"]])
            w.writerow(["Hyperparameters:"])
            w.writerow(["", "default weights:", str(dict(hp.default_weights))])
            w.writerow(["", "default threshold:", str(hp.default_threshold)])
            w.writerow(["", "near miss default:", str(hp.near_miss_default)])
            w.writerow(["", "feature name:", str(hp.feature_name)])
            w.writerow(["", "ballast:", str(hp.ballast)])
            w.writerow(["", "mu:", str(hp.mu)])
            w.writerow(["", "f_bootstrap:", str(hp.f_bootstrap)])
            w.writerow(["", "f_memory:", str(hp.f_memory)])
            w.writerow(["", "bootstrap type:", str(hp.bootstrap_type)])
            if hp.bootstrap_type == "bagging":
                w.writerow(["", "number of bags:", str(hp.nbags)])
            w.writerow([""])
            w.writerow(["List of all clips with scores greater than "
                        "min(threshold, score of lowest scoring user validated match)"])
            w.writerow(["clip #", "start time", "match type", "video pk",
                        "video clip id", "score", "duration", "notes"])
            # The reference made 2 HTTP round-trips PER selected clip here
            # (ticket.py:257-264: one video-clips read + one filtered
            # matches list each); a finalize over hundreds of matches
            # serialized hundreds of calls. One paginated matches list per
            # query_result + one batched clip read keeps the CSV bytes
            # identical at O(pages) calls (golden-report test).
            match_by_clip: dict[int, dict] = {}
            for m in self._all_matches(query_result_id):
                # first row wins: parity with the reference's results[0] on
                # its per-clip filtered list (ticket.py:259-264)
                match_by_clip.setdefault(m["video_clip"], m)
            clip_by_id = self._read_clips(list(self.matches))
            rows = []
            for video_clip_id, score in self.matches.items():
                if str(video_clip_id) in self.user_matches:
                    if self.user_matches[str(video_clip_id)] is True:
                        match_type = "user-identified match"
                    else:
                        match_type = "user-identified non-match"
                elif score >= query_result["match_criterion"]:
                    match_type = "inferred match"
                else:
                    match_type = "inferred non-match"
                video_clip = clip_by_id[video_clip_id]
                match = match_by_clip[video_clip_id]
                start_time = int(match["match_video_time_span"].split(",")[0])
                rows.append([
                    video_clip["clip"], str(timedelta(seconds=start_time)),
                    match_type, video_clip["video"], video_clip_id, score,
                    video_clip["duration"], video_clip["notes"],
                ])
            rows.sort(key=lambda r: r[5], reverse=True)
            for row in rows:
                w.writerow(row)

        with open(path, "r") as csvfile:
            self.client.action(
                ["queries", "partial_update"],
                {"id": self.query_id, "final_report_file": csvfile},
                encoding="multipart/form-data",
            )
        return path
