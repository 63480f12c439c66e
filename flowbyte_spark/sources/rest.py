"""REST orchestration hooks: dataset-refresh trigger + status polling.

Capability parity with the reference's Power BI module
(/root/reference/src/flowbyte/pbi.py): service-principal auth
(pbi.py:32-54), refresh-history fetch (pbi.py:89-119), last-status check
(pbi.py:123-158), and the guarded refresh trigger (pbi.py:163-214 — skip
when a refresh is already in flight, then confirm the new one started).

This is *driver-side orchestration*, not a Spark operator: the natural
call sites are after a batch ``write`` or inside a streaming
``foreachBatch`` (see streaming.foreach_batch_sink).  The HTTP transport
is injected so the state machine is testable without a network; a default
transport via ``urllib`` is provided (no extra deps).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

from flowbyte_spark import log

# Transport contract: (method, url, headers, body) -> (status_code, json_dict)
Transport = Callable[[str, str, dict, dict | None], tuple[int, dict]]


def urllib_transport(method: str, url: str, headers: dict, body: dict | None):
    """Encode ``body`` per the Content-Type header: AAD's token endpoint
    only accepts ``application/x-www-form-urlencoded`` (the reference gets
    this via msal, which form-encodes); the Power BI API itself is JSON."""
    if body is None:
        data = None
    elif "x-www-form-urlencoded" in headers.get("Content-Type", ""):
        data = urllib.parse.urlencode(body).encode()
    else:
        data = json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    with urllib.request.urlopen(req) as resp:  # pragma: no cover (network)
        payload = resp.read()
        return resp.status, json.loads(payload) if payload else {}


@dataclass
class TokenAuth:
    """Client-credentials token flow (pbi.py:32-54 shape).

    ``token_url`` receives the client id/secret and must return
    ``{"access_token": ...}``; the token is cached until ``invalidate``.
    """

    token_url: str
    client_id: str
    client_secret: str
    scope: str
    transport: Transport = urllib_transport
    _token: str | None = field(default=None, repr=False)

    def token(self) -> str:
        if self._token is None:
            status, payload = self.transport(
                "POST",
                self.token_url,
                {"Content-Type": "application/x-www-form-urlencoded"},
                {
                    "client_id": self.client_id,
                    "client_secret": self.client_secret,
                    "scope": self.scope,
                    "grant_type": "client_credentials",
                },
            )
            if status != 200 or "access_token" not in payload:
                raise RuntimeError(f"auth failed: HTTP {status}")
            self._token = payload["access_token"]
        return self._token

    def invalidate(self) -> None:
        self._token = None


IN_FLIGHT = "Unknown"  # the API reports an in-progress refresh as Unknown


@dataclass
class RefreshOrchestrator:
    """Guarded dataset-refresh trigger with status polling."""

    base_url: str
    auth: TokenAuth
    transport: Transport = urllib_transport

    def _headers(self) -> dict:
        return {
            "Authorization": f"Bearer {self.auth.token()}",
            "Content-Type": "application/json",
        }

    def get_refreshes(self, last_n: int = 1) -> list[dict]:
        """Refresh history, newest first (pbi.py:89-119 shape)."""
        status, payload = self.transport(
            "GET", f"{self.base_url}/refreshes?$top={last_n}", self._headers(), None
        )
        if status != 200:
            raise RuntimeError(f"refresh history failed: HTTP {status}")
        return payload.get("value", [])

    def get_last_refresh_status(self) -> str:
        """One of Completed / Failed / Disabled / Unknown (in flight) —
        pbi.py:123-158; 'Completed' when history is empty."""
        history = self.get_refreshes(1)
        return history[0]["status"] if history else "Completed"

    def refresh(self) -> bool:
        """Trigger a refresh unless one is in flight (pbi.py:163-214).

        Returns True if a new refresh was started and confirmed in flight,
        False if skipped because one was already running.
        """
        if self.get_last_refresh_status() == IN_FLIGHT:
            log.warning("refresh already in progress — skipping trigger")
            return False
        status, _ = self.transport(
            "POST", f"{self.base_url}/refreshes", self._headers(), {}
        )
        if status not in (200, 202):
            raise RuntimeError(f"refresh trigger failed: HTTP {status}")
        started = self.get_last_refresh_status() == IN_FLIGHT
        if started:
            log.success("dataset refresh started")
        else:
            log.warning("refresh trigger accepted but not visible in history yet")
        return True

    def as_post_batch_hook(self) -> Callable[[int], None]:
        """Adapter for streaming.foreach_batch_sink(post_batch_hook=...)."""

        def hook(batch_id: int) -> None:
            self.refresh()

        return hook
