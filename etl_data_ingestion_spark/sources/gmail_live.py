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
