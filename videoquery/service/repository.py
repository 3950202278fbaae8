"""Job polling repository (reference api_repository.py:12-78)."""

from __future__ import annotations

import json
import logging

from videoquery.service.client import ActionClient

log = logging.getLogger(__name__)


class APIRepository:
    """Fetches one pending job of each type per poll."""

    def __init__(self, client: ActionClient, url: str = ""):
        self.client = client
        self.url = url

    def get_status(self) -> dict | None:
        """{'revise': update|None, 'new': ..., 'finalize': ...}
        (api_repository.py:44-49)."""
        try:
            return {
                "revise": self._converted(["query-state", "compute-revised", "list"]),
                "new": self.client.action(["query-state", "compute-new", "list"]),
                "finalize": self._converted(["query-state", "compute-finalize", "list"]),
            }
        except Exception as exc:  # parity: poll errors logged, loop continues
            log.error("%s", exc)
            return None

    def _converted(self, action) -> dict | None:
        """Deserialize the JSON bootstrapped_target and convert its split keys
        from str to int (api_repository.py:65-78)."""
        result = self.client.action(action)
        if result and result.get("latest_query_result"):
            bt = result["latest_query_result"].get("bootstrapped_target")
            if bt:
                if isinstance(bt, str):
                    bt = json.loads(bt)
                result["latest_query_result"]["bootstrapped_target"] = {
                    stream: {int(split): vec for split, vec in split_dict.items()}
                    for stream, split_dict in bt.items()
                }
        return result
