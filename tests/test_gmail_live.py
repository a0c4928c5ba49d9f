"""Guarded live-Gmail connector (sources/gmail_live.py): the
reference's S1-S4 entry point + O5 commit, exercised against a
duck-typed fake service — pagination, fetch, attachment inlining,
label-removal commit, and the landed-JSON bridge into the engine's
distributed mailbox extract path."""

from __future__ import annotations

import base64
import json

import pytest

from etl_data_ingestion_spark.sources.gmail_live import GmailLiveSource


def b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode("ascii")


class FakeCall:
    def __init__(self, result):
        self._result = result

    def execute(self):
        return self._result


class FakeMessages:
    """users().messages() surface: list/get/attachments/modify with
    two-page pagination."""

    def __init__(self, store):
        self.store = store
        self.modified = []

    def list(self, userId, q, pageToken=None):
        ids = sorted(k for k in self.store if not k.startswith("_"))
        if pageToken is None:
            return FakeCall(
                {"messages": [{"id": i} for i in ids[:2]], "nextPageToken": "p2"}
            )
        assert pageToken == "p2"
        return FakeCall({"messages": [{"id": i} for i in ids[2:]]})

    def get(self, userId, id, format):
        assert format == "full"
        return FakeCall(json.loads(json.dumps(self.store[id])))  # deep copy

    def attachments(self):
        outer = self

        class A:
            def get(self, userId, messageId, id):
                return FakeCall({"data": b64url(outer.store["_att"][id])})

        return A()

    def modify(self, userId, id, body):
        self.modified.append((id, tuple(body["removeLabelIds"])))
        return FakeCall({})


class FakeService:
    def __init__(self, store):
        self._messages = FakeMessages(store)

    def users(self):
        svc = self

        class U:
            def messages(self):
                return svc._messages

        return U()


@pytest.fixture
def store():
    def msg(msg_id, att_id=None, inline=None):
        body = {}
        if att_id:
            body = {"attachmentId": att_id}
        elif inline is not None:
            body = {"data": b64url(inline)}
        return {
            "id": msg_id,
            "payload": {
                "mimeType": "multipart/mixed",
                "parts": [
                    {"filename": "", "mimeType": "text/plain",
                     "body": {"data": b64url(b"cover letter")}},
                    {"filename": f"CTB_{msg_id}.tsv", "mimeType": "text/tab-separated-values",
                     "body": body},
                ],
            },
        }

    return {
        "m1": msg("m1", att_id="att-1"),
        "m2": msg("m2", inline=b"A\tB\r\n1\t2\r\n"),
        "m3": msg("m3", att_id="att-3"),
        "_att": {"att-1": b"H1\tH2\r\nx\ty\r\n", "att-3": b"only\theader\r\n"},
    }


def test_pagination_fetch_and_commit(store):
    src = GmailLiveSource(service=FakeService(store))
    ids = list(src.list_message_ids("filename:CTB"))
    assert ids == ["m1", "m2", "m3"]

    m = src.fetch_message("m1")
    assert m["payload"]["parts"][1]["filename"] == "CTB_m1.tsv"

    assert src.fetch_attachment("m1", "att-1") == b"H1\tH2\r\nx\ty\r\n"

    src.commit("m1")
    assert FakeService(store)  # no cross-instance state
    assert src.service._messages.modified == [("m1", ("INBOX",))]


def test_land_messages_inlines_attachments_and_feeds_engine(store, spark, tmp_path):
    """End-to-end bridge: landed JSON (attachment bodies inlined) is
    directly consumable by the engine's distributed extract path
    (flatten -> first-CTB select -> urlsafe decode)."""
    import pyspark.sql.functions as F

    from etl_data_ingestion_spark.sources.mailbox import (
        decode_attachment_data,
        flatten_message_parts,
        select_ctb_attachments,
    )

    src = GmailLiveSource(service=FakeService(store))
    landing = tmp_path / "landed"
    paths = src.land_messages("filename:CTB", str(landing), commit=True)
    assert len(paths) == 3
    # commit (label removal) happened for every landed message
    assert [m for m, _ in src.service._messages.modified] == ["m1", "m2", "m3"]
    # attachment bodies were inlined — landed files are self-contained
    for p in paths:
        doc = json.loads(open(p).read())
        for part in doc["payload"]["parts"]:
            assert "attachmentId" not in part["body"] or part["body"].get("data")

    raw = spark.read.text(str(landing))
    flat = flatten_message_parts(raw)
    picked = select_ctb_attachments(flat)
    decoded = decode_attachment_data(picked).select("message_id", "content")
    got = {
        r.message_id: bytes(r.content).decode() for r in decoded.collect()
    }
    assert got == {
        "m1": "H1\tH2\r\nx\ty\r\n",
        "m2": "A\tB\r\n1\t2\r\n",
        "m3": "only\theader\r\n",
    }


def test_missing_google_libs_raise_clear_error():
    from etl_data_ingestion_spark.sources import gmail_live

    with pytest.raises(ImportError, match="google-api-python-client"):
        gmail_live.build_gmail_service("credentials.json", "token.json")
