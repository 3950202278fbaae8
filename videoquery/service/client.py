"""API client speaking the reference's coreapi action surface over plain
requests.

The reference drives the Video Query REST API through the (abandoned)
coreapi dynamic-schema client: it fetches ``<url>/docs`` and addresses
endpoints as ``["resource", "verb"]`` action pairs (ticket.py:36-37,
api_repository.py:17-19). This client keeps the exact action-pair surface
(SURVEY.md Appendix A) so every call site reads like the reference, but
resolves actions through a static route table matching the API's DRF router
conventions — no coreapi dependency.

Error handling parity: every request retries forever on connection errors
with a 50 ms backoff (reference ticket.py:384-400, target_clip.py:288-295,
api_load_records.py:115-121).
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Any, Mapping, Protocol, Sequence

log = logging.getLogger(__name__)

RETRY_SLEEP_SECONDS = 0.05  # reference ticket.py:388


class Transport(Protocol):
    def request(
        self,
        method: str,
        path: str,
        *,
        params: Mapping[str, Any] | None = None,
        data: Mapping[str, Any] | None = None,
        files: Mapping[str, Any] | None = None,
    ) -> Any: ...


def authenticate(api_url: str, session=None):
    """POST api-token-auth/ with API_CLIENT_USERNAME/API_CLIENT_PASSWORD env
    credentials; returns the token or None on failure (reference
    authenticate.py:6-24)."""
    import requests

    session = session or requests
    try:
        resp = session.post(
            api_url.rstrip("/") + "/api-token-auth/",
            data={
                "username": os.environ["API_CLIENT_USERNAME"],
                "password": os.environ["API_CLIENT_PASSWORD"],
            },
        )
        return resp.json()["token"]
    except Exception as exc:  # parity: reference prints and returns None
        log.error("Client Authentication Failed: %s", exc)
        return None


class HTTPTransport:
    """requests-backed transport with token auth and infinite connection
    retry."""

    def __init__(self, base_url: str, token: str | None = None,
                 fetch_schema: bool = True):
        import requests

        self.base_url = base_url.rstrip("/") + "/"
        self.session = requests.Session()
        if token is None:
            token = authenticate(self.base_url, self.session)
        if token:
            self.session.headers["Authorization"] = f"Token {token}"
        if fetch_schema:
            # Contract parity: the reference fetches the schema document at
            # startup (api_repository.py:19); we hit it once as a liveness /
            # auth check but resolve routes statically.
            try:
                self.session.get(self.base_url + "docs")
            except Exception:
                log.warning("could not fetch %sdocs; continuing", self.base_url)

    def request(self, method, path, *, params=None, data=None, files=None):
        import requests

        while True:
            try:
                resp = self.session.request(
                    method,
                    self.base_url + path,
                    params=params if method == "GET" else None,
                    data=data if files else None,
                    json=data if (data is not None and not files) else None,
                    files=files,
                )
                if resp.status_code == 204 or not resp.content:
                    return None
                return resp.json()
            except requests.ConnectionError:
                time.sleep(RETRY_SLEEP_SECONDS)
                log.warning("Try API request again: %s %s params=%s",
                            method, path, params)


# Action resolution: ["resource", ..., verb] -> (method, path template).
# Collection verbs take filter params in the query string; detail verbs
# consume the "id" param into the path (DRF router conventions used by the
# Video Query API; surface inventoried in SURVEY.md Appendix A).
_DETAIL_VERBS = {"read": "GET", "partial_update": "PATCH", "update": "PUT",
                 "delete": "DELETE", "features": "GET"}
_COLLECTION_VERBS = {"list": "GET", "create": "POST"}


def _route_overrides() -> dict[tuple[str, ...], tuple[str, str, bool]]:
    """Escape hatch if the live Django API's router differs from the static
    table: VIDEOQUERY_ROUTE_OVERRIDES='{"videos.list": ["GET", "video/", false]}'
    (keys are dot-joined action pairs; values [method, path-template,
    is_detail] — detail templates contain '{id}'). Parsed once per env
    value — not per request."""
    return _parse_route_overrides(
        os.environ.get("VIDEOQUERY_ROUTE_OVERRIDES") or "")


@functools.lru_cache(maxsize=4)
def _parse_route_overrides(raw: str) -> dict:
    if not raw:
        return {}
    import json

    try:
        table = json.loads(raw)
        return {tuple(k.split(".")): (v[0], v[1], bool(v[2]))
                for k, v in table.items()}
    except Exception as exc:  # noqa: BLE001
        log.error("bad VIDEOQUERY_ROUTE_OVERRIDES (%s); ignoring", exc)
        return {}


def resolve_action(action: Sequence[str]) -> tuple[str, str, bool]:
    """Returns (method, path-template, is_detail). Detail paths contain
    '{id}'."""
    override = _route_overrides().get(tuple(action))
    if override is not None:
        return override
    action = list(action)
    verb = action[-1]
    resource = "/".join(action[:-1])
    if len(action) >= 3 and verb == "list":
        # nested list routes, e.g. ["query-state", "compute-new", "list"]
        return "GET", f"{resource}/", False
    if verb in _COLLECTION_VERBS:
        return _COLLECTION_VERBS[verb], f"{resource}/", False
    if verb in _DETAIL_VERBS:
        suffix = "" if verb in ("read", "partial_update", "update", "delete") else f"{verb}/"
        return _DETAIL_VERBS[verb], f"{resource}/{{id}}/{suffix}", True
    raise ValueError(f"unknown action verb {verb!r} in {action}")


class ActionClient:
    """coreapi-compatible facade: client.action(schema-less action pair)."""

    def __init__(self, transport: Transport):
        self.transport = transport

    def action(
        self,
        action: Sequence[str],
        params: Mapping[str, Any] | None = None,
        encoding: str | None = None,
    ) -> Any:
        method, template, is_detail = resolve_action(action)
        params = dict(params or {})
        files = None
        if encoding == "multipart/form-data":
            files = {
                k: v for k, v in params.items() if hasattr(v, "read")
            }
            params = {k: v for k, v in params.items() if not hasattr(v, "read")}
        path = template
        if is_detail:
            path = template.format(id=params.pop("id"))
        if method == "GET":
            return self.transport.request(method, path, params=params)
        return self.transport.request(method, path, data=params, files=files)


def make_client(base_url: str, transport: Transport | None = None) -> ActionClient:
    return ActionClient(transport or HTTPTransport(base_url))
