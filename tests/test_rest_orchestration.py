"""REST refresh-orchestration state machine tests (fake transport —
capability parity with pbi.py:32-214 without a network)."""

from __future__ import annotations

import pytest

from flowbyte_spark.sources.rest import IN_FLIGHT, RefreshOrchestrator, TokenAuth


class FakeService:
    """Minimal refresh API double: history list + trigger endpoint."""

    def __init__(self, history=None, fail_auth=False):
        self.history = history if history is not None else []
        self.fail_auth = fail_auth
        self.posts = 0
        self.token_requests = 0

    def transport(self, method, url, headers, body):
        if url.endswith("/token"):
            self.token_requests += 1
            if self.fail_auth:
                return 401, {}
            return 200, {"access_token": "tok-123"}
        assert headers.get("Authorization") == "Bearer tok-123"
        if method == "GET" and "/refreshes" in url:
            return 200, {"value": self.history}
        if method == "POST" and url.endswith("/refreshes"):
            self.posts += 1
            self.history.insert(0, {"status": IN_FLIGHT, "id": self.posts})
            return 202, {}
        return 404, {}


def make(service):
    auth = TokenAuth(
        token_url="https://svc/token",
        client_id="cid",
        client_secret="sec",
        scope="scope",
        transport=service.transport,
    )
    return RefreshOrchestrator(
        base_url="https://svc/datasets/d1", auth=auth, transport=service.transport
    )


def test_refresh_triggers_when_idle():
    svc = FakeService(history=[{"status": "Completed"}])
    orch = make(svc)
    assert orch.refresh() is True
    assert svc.posts == 1
    assert orch.get_last_refresh_status() == IN_FLIGHT


def test_refresh_skipped_when_in_flight():
    svc = FakeService(history=[{"status": IN_FLIGHT}])
    orch = make(svc)
    assert orch.refresh() is False  # guard: pbi.py:179-183 semantics
    assert svc.posts == 0


def test_empty_history_treated_as_idle():
    svc = FakeService(history=[])
    orch = make(svc)
    assert orch.get_last_refresh_status() == "Completed"
    assert orch.refresh() is True


def test_auth_failure_raises():
    svc = FakeService(fail_auth=True)
    orch = make(svc)
    with pytest.raises(RuntimeError, match="auth failed"):
        orch.refresh()


def test_token_cached_across_calls():
    svc = FakeService(history=[{"status": "Completed"}])
    orch = make(svc)
    orch.refresh()
    orch.get_refreshes(3)
    assert svc.token_requests == 1


def test_post_batch_hook_adapter():
    svc = FakeService(history=[{"status": "Completed"}])
    hook = make(svc).as_post_batch_hook()
    hook(0)
    assert svc.posts == 1
    hook(1)  # now in flight -> skipped, no second POST
    assert svc.posts == 1


def test_token_request_is_form_encoded(monkeypatch):
    """AAD's /oauth2/v2.0/token only accepts x-www-form-urlencoded; the
    token flow must declare it and urllib_transport must honor it."""
    import io
    import urllib.request

    from flowbyte_spark.sources import rest

    seen = {}

    class FakeResp(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(req):
        seen["content_type"] = req.headers.get("Content-type")
        seen["data"] = req.data
        return FakeResp(b'{"access_token": "tok"}')

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    auth = rest.TokenAuth(
        token_url="https://login.example/oauth2/v2.0/token",
        client_id="cid",
        client_secret="s&cret",
        scope="https://scope/.default",
    )
    assert auth.token() == "tok"
    assert seen["content_type"] == "application/x-www-form-urlencoded"
    body = seen["data"].decode()
    assert "client_secret=s%26cret" in body and "grant_type=client_credentials" in body
    assert not body.startswith("{")  # not JSON

    # JSON bodies still JSON-encode (the Power BI API side)
    rest.urllib_transport(
        "POST", "https://api.example/refreshes",
        {"Content-Type": "application/json"}, {"notifyOption": "NoNotification"},
    )
    assert seen["data"] == b'{"notifyOption": "NoNotification"}'
