"""ST6 alerting channel — the notification sink on reconciliation failure.

Reference behavior being replaced: DataCheckService compares DB counts to
the chain's counts and MAILS on divergence — sendMail(to, 'MetEast Assist
Service Sync Failed', 'DB Order Count: X     Web3 Order Count: Y')
(data-check.service.ts:24-60, mail.service.ts). The check computation
itself is queries/quality.dq_quality_checks; this module is the missing
delivery half, kept deliberately tiny and driver-side:

- a check readout is METADATA-SIZED (one row per check), so collecting it
  on the driver and notifying is the right shape — alerting is not a
  distributed problem, and no data-scale frame ever reaches a channel;
- channels are pluggable behind one ``send(subject, body)`` method.
  :class:`FileAlertChannel` (durable JSONL append) is the
  container-portable transport; :class:`SmtpAlertChannel` is the
  reference-parity mail transport on stdlib smtplib, constructed eagerly
  but connecting only at send() — this container has no SMTP endpoint,
  so tests pin the RENDERED message and the failure-gating logic, and a
  recording channel stands in for the socket (the delta_sink gating
  pattern applied to mail).

Streaming shape: :func:`dq_alert_sink` wraps a channel as a foreachBatch
callable so a streaming DQ readout alerts per micro-batch; batch jobs
call :func:`alert_on_failures` directly after the check action.
"""

from __future__ import annotations

import json
import os
import time
from typing import Protocol

from pyspark.sql import DataFrame


class AlertChannel(Protocol):
    """Anything that can deliver one rendered alert."""

    def send(self, subject: str, body: str) -> None: ...


class FileAlertChannel:
    """Durable JSONL alert log — the audit channel that works anywhere.
    One line per alert: {ts, subject, body}."""

    def __init__(self, path: str):
        self.path = path

    def send(self, subject: str, body: str) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(
                {"ts": int(time.time()), "subject": subject, "body": body}
            ) + "\n")


class SmtpAlertChannel:
    """Reference-parity mail transport (mail.service.ts sendMail): one
    EmailMessage per alert over stdlib smtplib. Connects only inside
    send(), so constructing the channel in an SMTP-less environment is
    free and the failure is actionable at delivery time."""

    def __init__(
        self,
        host: str,
        sender: str,
        to: str,
        port: int = 25,
        use_tls: bool = False,
    ):
        self.host = host
        self.port = port
        self.sender = sender
        self.to = to
        self.use_tls = use_tls

    def send(self, subject: str, body: str) -> None:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = self.sender
        msg["To"] = self.to
        msg.set_content(body)
        with smtplib.SMTP(self.host, self.port, timeout=30) as s:
            if self.use_tls:
                s.starttls()
            s.send_message(msg)


ALERT_SUBJECT = "pasardassist-spark DQ check failed"


def render_alert(failures: list[dict]) -> tuple[str, str]:
    """Render failed checks into (subject, body). Mirrors the reference's
    mail shape — subject names the failing service, body carries the
    diverging counts ('DB Order Count: X     Web3 Order Count: Y',
    data-check.service.ts:48-50) — generalized to one line per failed
    check: 'check_name: N violations'."""
    body = "\n".join(
        f"{f['check']}: {f['n_violations']} violations" for f in failures
    )
    n = len(failures)
    return f"{ALERT_SUBJECT} ({n} check{'s' if n != 1 else ''})", body


def alert_on_failures(
    checks: DataFrame, channel: AlertChannel
) -> list[dict]:
    """Run the check readout's terminal action, deliver ONE alert naming
    every failed check (n_violations > 0), and return the failure dicts
    (empty = all green, nothing sent). ``checks`` must be the
    (check, n_violations) readout frame — metadata-sized by construction
    (one row per registered check), so the collect is driver-safe."""
    failures = [
        {"check": r["check"], "n_violations": int(r["n_violations"])}
        for r in checks.collect()
        if r["n_violations"] and r["n_violations"] > 0
    ]
    if failures:
        subject, body = render_alert(failures)
        channel.send(subject, body)
    return failures


def dq_alert_sink(channel: AlertChannel):
    """foreachBatch adapter: run alert_on_failures on each micro-batch of
    a STREAMING check readout (the reference's @Interval timer becomes
    the stream trigger). Failures in one batch never suppress the next —
    each batch re-evaluates and re-alerts, matching the reference's
    every-interval re-mail behavior."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        alert_on_failures(batch_df, channel)

    return _sink
