"""Live Gmail connectivity (reference S1-S4 + O5, main.py:96-219 and
630-645) — the reference's actual entry point, re-expressed as a thin
connector that LANDS messages into the engine's mailbox layout and
stays entirely outside the distributed dataflow.

Guarded: the Google client libraries (google-api-python-client,
google-auth-oauthlib — public PyPI packages) are not installed in
this environment, so every entry point either accepts an injected
service object (tests, alternative transports) or raises a clear
ImportError naming the missing packages. The CONNECTOR logic —
pagination, message fetch, attachment fetch, urlsafe-b64 payloads,
INBOX-label commit — is real and unit-tested against a duck-typed
fake service; only the OAuth dance and HTTP transport live behind
the guard.

Division of labor (why this is a landing-side driver component, not
an operator): one mailbox is one API endpoint with per-user rate
limits — listing/fetching it is inherently a small sequential loop
(the reference's main.py:660-677 does exactly this). The ENGINE's
scale problem starts after landing: thousands of landed files ×
distributed parse/coerce/dedup, which is what sources/mailbox*.py
and ingest/ handle. A connector that pretended to be distributed
would just move the rate limit into executor retries.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass
from typing import Any, Iterator, Optional

GMAIL_SCOPES = ("https://www.googleapis.com/auth/gmail.modify",)


def _require_google_libs():
    try:
        from google.auth.transport.requests import Request  # noqa: F401
        from google.oauth2.credentials import Credentials  # noqa: F401
        from google_auth_oauthlib.flow import InstalledAppFlow  # noqa: F401
        from googleapiclient.discovery import build  # noqa: F401
    except ImportError as e:  # pragma: no cover - absent in this env
        raise ImportError(
            "Live Gmail connectivity needs google-api-python-client and "
            "google-auth-oauthlib (pip install google-api-python-client "
            "google-auth-oauthlib); alternatively inject a prebuilt "
            "`service` object."
        ) from e
    return Request, Credentials, InstalledAppFlow, build


def build_gmail_service(credentials_path: str, token_path: str):
    """S1 (main.py:96-155): cached-token-first OAuth — reuse/refresh
    token.json when possible, run the installed-app browser flow only
    when no usable token exists, persist the refreshed token."""
    Request, Credentials, InstalledAppFlow, build = _require_google_libs()
    creds = None
    if os.path.exists(token_path):
        creds = Credentials.from_authorized_user_file(token_path, list(GMAIL_SCOPES))
    if not creds or not creds.valid:
        if creds and creds.expired and creds.refresh_token:
            creds.refresh(Request())
        else:
            flow = InstalledAppFlow.from_client_secrets_file(
                credentials_path, list(GMAIL_SCOPES)
            )
            creds = flow.run_local_server(port=0)
        with open(token_path, "w") as f:
            f.write(creds.to_json())
    return build("gmail", "v1", credentials=creds, cache_discovery=False)


@dataclass
class GmailLiveSource:
    """The reference's mailbox loop against a real (or injected)
    Gmail service, landing message JSON in the layout
    `sources/mailbox.py` / the `mailbox` DataSource read."""

    service: Any  # googleapiclient Resource or duck-typed fake
    user_id: str = "me"

    @classmethod
    def connect(
        cls, credentials_path: str, token_path: str, user_id: str = "me"
    ) -> "GmailLiveSource":
        return cls(build_gmail_service(credentials_path, token_path), user_id)

    # -- S2: query-filtered listing with pagination (main.py:158-177)
    def list_message_ids(self, query: str) -> Iterator[str]:
        req = self.service.users().messages()
        page_token: Optional[str] = None
        while True:
            resp = req.list(
                userId=self.user_id, q=query, pageToken=page_token
            ).execute()
            for m in resp.get("messages", []):
                yield m["id"]
            page_token = resp.get("nextPageToken")
            if not page_token:
                return

    # -- S3: full message fetch by id (main.py:180-197)
    def fetch_message(self, msg_id: str) -> dict:
        return (
            self.service.users()
            .messages()
            .get(userId=self.user_id, id=msg_id, format="full")
            .execute()
        )

    # -- S4: attachment blob fetch, urlsafe-b64 payload (main.py:200-219)
    def fetch_attachment(self, msg_id: str, attachment_id: str) -> bytes:
        att = (
            self.service.users()
            .messages()
            .attachments()
            .get(userId=self.user_id, messageId=msg_id, id=attachment_id)
            .execute()
        )
        return base64.urlsafe_b64decode(att["data"])

    # -- O5: source commit = INBOX label removal (main.py:630-645).
    # At-most-once, exactly like the reference; the engine's
    # exactly-once replacement is the checkpointed streaming offsets
    # (ingest/stream_runner.py) over the LANDED files.
    def commit(self, msg_id: str) -> None:
        self.service.users().messages().modify(
            userId=self.user_id,
            id=msg_id,
            body={"removeLabelIds": ["INBOX"]},
        ).execute()

    def land_messages(
        self, query: str, landing_dir: str, commit: bool = False
    ) -> list[str]:
        """List → fetch → write one JSON file per message into the
        mailbox layout (the engine's `spark.read.format("mailbox")`
        scans this directory distributively). Returns landed paths.
        Inlining attachment bodies keeps each landed file
        self-contained, so the distributed extract path never calls
        the API."""
        os.makedirs(landing_dir, exist_ok=True)
        landed = []
        for msg_id in self.list_message_ids(query):
            msg = self.fetch_message(msg_id)
            self._inline_attachments(msg_id, msg.get("payload", {}))
            path = os.path.join(landing_dir, f"{msg_id}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(msg, f)
            landed.append(path)
            if commit:
                self.commit(msg_id)
        return landed

    def _inline_attachments(self, msg_id: str, part: dict) -> None:
        """Recursive MIME walk (S5 shape, main.py:514-572): any part
        whose body carries only an attachmentId gets its data fetched
        and inlined as the urlsafe-b64 string the extract path
        expects."""
        body = part.get("body", {})
        if body.get("attachmentId") and not body.get("data"):
            raw = self.fetch_attachment(msg_id, body["attachmentId"])
            body["data"] = base64.urlsafe_b64encode(raw).decode("ascii")
        for child in part.get("parts", []) or []:
            self._inline_attachments(msg_id, child)


# ---------------------------------------------------------------- S1b
# Web-application OAuth variant (reference main.py:53-93,123-135):
# the reference does NOT use the installed-app console flow above —
# it prints an authorization URL, opens a browser, and runs a
# one-shot localhost HTTP server whose /callback handler exchanges
# the returned ?code= for credentials and persists the token. The
# handler/exchange logic below is transport-free (pure function over
# the request path + a duck-typed flow), so it is unit-testable
# without google libs or a network; only the real Flow construction
# and the real socket server live behind the import guard.

CALLBACK_PATH = "/callback"


def handle_oauth_callback(
    path: str, flow: Any, token_path: str
) -> tuple[int, bytes, Optional[Any]]:
    """One GET against the callback server → (status, body, creds).

    Mirrors the reference CallbackHandler.do_GET state machine
    (main.py:53-93): non-/callback paths → 404; missing ?code= →
    400; token-exchange failure → 500; success → fetch_token(code),
    persist flow.credentials.to_json() to token_path, 200. `flow`
    is duck-typed (real google_auth_oauthlib Flow or a test fake
    with fetch_token/credentials)."""
    from urllib.parse import parse_qs, urlparse

    parsed = urlparse(path)
    if parsed.path != CALLBACK_PATH:
        return 404, b"Not found.", None
    code = parse_qs(parsed.query).get("code", [None])[0]
    if not code:
        return 400, b"Authorization code not received.", None
    try:
        flow.fetch_token(code=code)
        creds = flow.credentials
        with open(token_path, "w") as f:
            f.write(creds.to_json())
        return (
            200,
            b"Authentication successful! You can close this window.",
            creds,
        )
    except Exception as e:  # mirror reference: report, keep serving side up
        return 500, f"Authentication failed: {e}".encode(), None


def _make_callback_handler(flow: Any, token_path: str, result_box: dict):
    """BaseHTTPRequestHandler subclass delegating to
    handle_oauth_callback; the exchanged credentials land in
    result_box['creds'] for the caller that owns the server."""
    from http.server import BaseHTTPRequestHandler

    class CallbackHandler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (http.server API)
            status, body, creds = handle_oauth_callback(
                self.path, flow, token_path
            )
            if creds is not None:
                result_box["creds"] = creds
            self.send_response(status)
            self.send_header("Content-type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet one-shot server
            pass

    return CallbackHandler


def _serve_one_callback(flow: Any, token_path: str, redirect_uri: str):
    """Run the one-shot localhost callback server the reference uses
    (main.py:131-135): bind the redirect-URI port, handle exactly one
    request, return the exchanged credentials (or None)."""
    from http.server import HTTPServer
    from urllib.parse import urlparse

    loc = urlparse(redirect_uri)
    box: dict = {}
    httpd = HTTPServer((loc.hostname or "localhost", loc.port or 8080),
                       _make_callback_handler(flow, token_path, box))
    try:
        httpd.handle_request()
    finally:
        httpd.server_close()
    return box.get("creds")


def build_gmail_service_web(
    client_secret_path: str,
    token_path: str,
    redirect_uri: str = "http://localhost:8080/callback",
    *,
    _flow_factory=None,
    _serve_callback=None,
    _browser_open=None,
    _service_builder=None,
    _token_loader=None,
):
    """S1, web-application flow (reference main.py:96-155 via the
    callback server at main.py:53-93): cached-token-first like the
    installed-app variant, but the interactive leg prints/opens an
    authorization URL and blocks on ONE localhost callback request
    instead of run_local_server's console flow.

    The underscore-keyword seams inject duck-typed fakes in tests
    (no google libs, no network); left at None they resolve to the
    real guarded google implementations."""
    if None in (_flow_factory, _serve_callback, _browser_open,
                _service_builder, _token_loader):
        Request, Credentials, _, build = _require_google_libs()
        from google_auth_oauthlib.flow import Flow

        _flow_factory = _flow_factory or (
            lambda secret, uri: Flow.from_client_secrets_file(
                secret, scopes=list(GMAIL_SCOPES), redirect_uri=uri
            )
        )
        _serve_callback = _serve_callback or _serve_one_callback
        _browser_open = _browser_open or __import__("webbrowser").open
        _service_builder = _service_builder or (
            lambda creds: build(
                "gmail", "v1", credentials=creds, cache_discovery=False
            )
        )
        _token_loader = _token_loader or (
            lambda p: Credentials.from_authorized_user_file(
                p, list(GMAIL_SCOPES)
            )
        )
        _refresh = lambda c: c.refresh(Request())  # noqa: E731
    else:
        _refresh = lambda c: c.refresh(None)  # noqa: E731 (fakes self-refresh)

    creds = None
    if os.path.exists(token_path):
        creds = _token_loader(token_path)
    if not creds or not creds.valid:
        if creds and creds.expired and creds.refresh_token:
            _refresh(creds)
            with open(token_path, "w") as f:
                f.write(creds.to_json())
        else:
            flow = _flow_factory(client_secret_path, redirect_uri)
            auth_url, _ = flow.authorization_url(prompt="consent")
            _browser_open(auth_url)
            creds = _serve_callback(flow, token_path, redirect_uri)
    if creds is None:
        raise RuntimeError("Authentication failed or was not completed.")
    return _service_builder(creds)
