"""State-3 job lease: recovery from a broker that died mid-job.

The reference has no recovery path: compute_matches PATCHes a query to
process_state 3 ("in progress", compute_matches.py:42-43) and a broker
crash before the terminal PATCH leaves the job in state 3 forever — the
poll endpoints only return states 1/2/6, so no later poll ever sees it
(SURVEY.md §5.3 documents the flaw).

Fix: a lease breadcrumb in the query's own notes field. When a broker
picks up a job it stamps `[lease] processing <type> since <unix_ts>`
alongside the state-3 PATCH; every poll, the broker lists state-3 queries
and resets any whose stamp is older than the lease period back to its
REQUESTING state (new -> 1, revise -> 2, finalize -> 6), appending an
audit note. The breadcrumb lives in the DB, so recovery works across
broker processes and restarts with no shared memory — the same
DB-as-checkpoint contract the round state already uses (SURVEY.md §5.4).
Resetting is idempotent: two brokers racing the same expired lease both
write the same requesting state, and the job is then re-processed exactly
as if the user had re-requested it (every per-round write is keyed by a
fresh query_result row, so a re-run duplicates nothing).

A state-3 query with NO breadcrumb (a foreign writer, or a pre-lease
broker version) is aged with an in-memory first-seen clock instead, so it
still recovers — just only by a broker that stays up for a lease period.

Operational contracts (docs/PARITY.md "lease recovery" row):

- **BROKER_LEASE_SECONDS must exceed the worst-case job duration.** The
  stamp is written once at pickup and not renewed mid-job, so a healthy
  broker whose job legitimately outlives the lease gets that job reset by
  a peer and re-processed (an extra duplicate round — harmless to final
  state, wasteful). Default 600 s covers measured rounds (≤ a few seconds
  at 1M segments) with two orders of magnitude of slack; raise it before
  pointing the broker at search sets that take minutes per round.
- **The recovery scan needs a `queries list ?process_state=` route**,
  which is standard DRF filtering but beyond the action surface the
  reference consumes (SURVEY.md Appendix A). Against an API without it,
  recovery degrades to off — recover() warns ONCE and the advertised
  crash recovery does not run.
- stamp()'s read-modify-write of the notes field can drop a note written
  concurrently by another writer between the read and the PATCH; notes
  are advisory/human-facing, so this is tolerated rather than locked.
"""

from __future__ import annotations

import logging
import re
import time
from datetime import datetime, timezone

from videoquery.core.config import STATE_IN_PROGRESS
from videoquery.service.client import ActionClient

log = logging.getLogger(__name__)

# job type -> the process_state that requests it (fake_api.py mirrors the
# API semantics the reference broker observes: compute-new polls state 1,
# compute-revised state 2, compute-finalize state 6)
REQUESTING_STATE = {"new": 1, "revise": 2, "finalize": 6}

_STAMP_RE = re.compile(r"\[lease\] processing (\w+) since ([0-9]+(?:\.[0-9]+)?)")


def stamp_note(update_type: str, now: float | None = None) -> str:
    now = time.time() if now is None else now
    iso = datetime.fromtimestamp(now, timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    return f"[lease] processing {update_type} since {now:.0f} ({iso})"


def stamp(client: ActionClient, query_id: int, update_type: str,
          now: float | None = None) -> None:
    """Record the lease breadcrumb on the query being picked up.

    Replaces any previous `[lease] processing` line (one read-modify-write,
    like Ticket.add_note) so notes stay bounded across rounds."""
    current = client.action(["queries", "read"], {"id": query_id})
    notes = current.get("notes") or ""
    kept = [ln for ln in notes.splitlines()
            if not _STAMP_RE.search(ln)]
    while kept and not kept[-1].strip():
        kept.pop()
    lines = kept + ([""] if kept else []) + [stamp_note(update_type, now)]
    client.action(["queries", "partial_update"],
                  {"id": query_id, "notes": "\n".join(lines)})


class LeaseRecovery:
    """Per-broker recovery scanner (call .recover() once per poll)."""

    def __init__(self, client: ActionClient, lease_seconds: float):
        self.client = client
        self.lease_seconds = lease_seconds
        # fallback clock for state-3 queries with no breadcrumb
        self._first_seen: dict[int, float] = {}
        self._warned_unavailable = False

    def recover(self, now: float | None = None) -> list[int]:
        """Reset every expired state-3 query; returns the reset query ids."""
        if self.lease_seconds <= 0:
            return []
        now = time.time() if now is None else now
        try:
            resp = self.client.action(
                ["queries", "list"], {"process_state": STATE_IN_PROGRESS})
        except Exception as exc:  # an API without queries/list: feature off
            if not self._warned_unavailable:
                # one-time WARNING, not debug: crash recovery silently not
                # running is an operational surprise worth surfacing
                log.warning(
                    "lease recovery disabled: this API does not serve "
                    "queries list?process_state= (a filtered-list route "
                    "beyond the reference action surface, SURVEY.md "
                    "Appendix A); jobs stranded in state 3 by a crashed "
                    "broker will NOT be recovered (%s)", exc)
                self._warned_unavailable = True
            return []
        rows = resp.get("results", []) if isinstance(resp, dict) else resp
        reset: list[int] = []
        live = set()
        for q in rows:
            qid = q["id"]
            live.add(qid)
            update_type, since = self._parse(q.get("notes") or "")
            if since is None:
                # no breadcrumb: age by first observation from THIS broker
                since = self._first_seen.setdefault(qid, now)
            age = now - since
            if age < self.lease_seconds:
                continue
            target = REQUESTING_STATE.get(update_type or "", None)
            if target is None:
                # unknown origin: a query with history was mid-revise (the
                # conservative choice — finalize must be user re-requested),
                # one without was mid-new
                has_history = bool(q.get("latest_query_result")) or \
                    self._has_results(qid)
                target = REQUESTING_STATE["revise" if has_history else "new"]
            note = (q.get("notes") or "").rstrip()
            audit = (f"[lease] reset to state {target} after "
                     f"{age:.0f}s in state 3 (broker crash suspected)")
            self.client.action(["queries", "partial_update"], {
                "id": qid,
                "process_state": target,
                "notes": note + ("\n\n" if note else "") + audit,
            })
            log.warning("lease recovery: query %s reset to state %s "
                        "after %.0fs in state 3", qid, target, age)
            self._first_seen.pop(qid, None)
            reset.append(qid)
        # queries that left state 3 on their own drop out of the clock
        for qid in list(self._first_seen):
            if qid not in live:
                del self._first_seen[qid]
        return reset

    def _has_results(self, query_id: int) -> bool:
        try:
            q = self.client.action(["queries", "read"], {"id": query_id})
            return bool(q.get("latest_query_result"))
        except Exception:
            return False

    @staticmethod
    def _parse(notes: str) -> tuple[str | None, float | None]:
        """Last lease stamp in the notes (later stamps supersede)."""
        last = None
        for m in _STAMP_RE.finditer(notes):
            last = m
        if last is None:
            return None, None
        return last.group(1), float(last.group(2))
