"""Notification side-channel (reference O1-O4, main.py:575-627).

The reference emails success / error / no-data reports through Gmail.
The engine keeps the same event surface behind a protocol so the
dataflow core stays pure; production would plug an SMTP/webhook
implementation, tests plug the collecting one. Notification content is
fed by aggregate counts (df.observe metrics) — never by collecting
rows to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol


class Notifier(Protocol):
    def success(self, filename: str, inserted_rows: int) -> None: ...
    def error(self, context: str, details: str) -> None: ...
    def no_data(self, query: str) -> None: ...


@dataclass
class Notification:
    kind: str  # success | error | no_data
    subject: str
    body: str


@dataclass
class CollectingNotifier:
    """Accumulates notifications; the test/driver double."""

    events: list[Notification] = field(default_factory=list)

    def success(self, filename: str, inserted_rows: int) -> None:
        # subject/body shape mirrors send_success_email (main.py:591-598)
        self.events.append(
            Notification(
                "success",
                f"SUCCESS: CTB File Processed - {filename}",
                f"Successfully inserted {inserted_rows} rows from '{filename}'.",
            )
        )

    def error(self, context: str, details: str) -> None:
        # mirrors send_error_email (main.py:601-620)
        self.events.append(
            Notification(
                "error", f"ERROR: CTB Processing Failed - {context}", details
            )
        )

    def no_data(self, query: str) -> None:
        # mirrors send_no_ctb_email (main.py:623-627)
        self.events.append(
            Notification(
                "no_data",
                "No CTB files found",
                f"No messages matched query: {query}",
            )
        )


class ConsoleNotifier(CollectingNotifier):
    """Prints as it collects — the local/dev default."""

    def success(self, filename: str, inserted_rows: int) -> None:
        super().success(filename, inserted_rows)
        print(f"[notify] {self.events[-1].subject}")

    def error(self, context: str, details: str) -> None:
        super().error(context, details)
        print(f"[notify] {self.events[-1].subject}")

    def no_data(self, query: str) -> None:
        super().no_data(query)
        print(f"[notify] {self.events[-1].subject}")


@dataclass
class SmtpNotifier(CollectingNotifier):
    """Real email transport (reference O1, main.py:575-588: SMTP over
    Gmail with app credentials) — completes the Notifier protocol with
    the delivery mechanism the reference actually uses.

    Composition: message CONTENT comes from CollectingNotifier (the
    subject/body shapes mirroring main.py:591-627 stay in one place
    and remain inspectable in self.events after sending); this class
    only adds transport. smtplib is stdlib, so no guard is needed —
    but the connection is opened per send and failures raise to the
    caller (the runner's per-file exception isolation decides policy,
    mirroring the reference's try/except around each send,
    main.py:585-588)."""

    host: str = "localhost"
    port: int = 25
    sender: str = "etl-engine@localhost"
    recipients: tuple[str, ...] = ()
    # repr=False: credentials must never leak through the generated
    # __repr__ into error/debug logs that format the notifier
    username: str | None = field(default=None, repr=False)
    password: str | None = field(default=None, repr=False)
    use_tls: bool = False
    # injection point for tests / alternative transports: a callable
    # returning an smtplib.SMTP-compatible object
    connection_factory: object | None = None

    def _send(self, subject: str, body: str) -> None:
        if not self.recipients:
            return
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = self.sender
        msg["To"] = ", ".join(self.recipients)
        msg.set_content(body)

        factory = self.connection_factory or (
            lambda: smtplib.SMTP(self.host, self.port, timeout=30)
        )
        conn = factory()
        try:
            if self.use_tls:
                conn.starttls()
            if self.username and self.password:
                conn.login(self.username, self.password)
            conn.send_message(msg)
        finally:
            conn.quit()

    def success(self, filename: str, inserted_rows: int) -> None:
        super().success(filename, inserted_rows)
        self._send(self.events[-1].subject, self.events[-1].body)

    def error(self, context: str, details: str) -> None:
        super().error(context, details)
        self._send(self.events[-1].subject, self.events[-1].body)

    def no_data(self, query: str) -> None:
        super().no_data(query)
        self._send(self.events[-1].subject, self.events[-1].body)
