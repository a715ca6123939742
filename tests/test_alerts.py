"""ST6 alerting channel (streaming/alerts.py): the notification half of
the reference's DataCheckService — checks that diverge must produce ONE
rendered alert through a pluggable channel; green suites send nothing."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pasardassist_spark.streaming.alerts import (
    ALERT_SUBJECT,
    FileAlertChannel,
    SmtpAlertChannel,
    alert_on_failures,
    dq_alert_sink,
    render_alert,
)


class RecordingChannel:
    def __init__(self):
        self.sent: list[tuple[str, str]] = []

    def send(self, subject: str, body: str) -> None:
        self.sent.append((subject, body))


def _checks(spark, rows):
    return spark.createDataFrame(rows, "check string, n_violations long")


def test_green_suite_sends_nothing(spark):
    ch = RecordingChannel()
    out = alert_on_failures(
        _checks(spark, [("a", 0), ("b", 0)]), ch
    )
    assert out == [] and ch.sent == []


def test_failures_send_one_alert_naming_each_check(spark):
    ch = RecordingChannel()
    out = alert_on_failures(
        _checks(spark, [("orders_missing_customer", 3), ("ok_check", 0),
                        ("events_duplicate_ids", 1)]), ch
    )
    assert [f["check"] for f in out] == [
        "orders_missing_customer", "events_duplicate_ids"
    ]
    assert len(ch.sent) == 1, "one alert per readout, not one per check"
    subject, body = ch.sent[0]
    assert subject == f"{ALERT_SUBJECT} (2 checks)"
    assert "orders_missing_customer: 3 violations" in body
    assert "events_duplicate_ids: 1 violations" in body
    assert "ok_check" not in body


def test_render_mirrors_reference_shape():
    """Reference mail: subject names the failing service, body carries the
    diverging counts (data-check.service.ts:48-50). Ours: one line per
    failed check with its violation count."""
    subject, body = render_alert([{"check": "sync_drift", "n_violations": 7}])
    assert subject.endswith("(1 check)")
    assert body == "sync_drift: 7 violations"


def test_file_channel_appends_jsonl(spark, tmp_path):
    path = str(tmp_path / "alerts" / "dq.jsonl")
    ch = FileAlertChannel(path)
    alert_on_failures(_checks(spark, [("c1", 2)]), ch)
    alert_on_failures(_checks(spark, [("c2", 5)]), ch)
    lines = [json.loads(x) for x in open(path)]
    assert len(lines) == 2
    assert lines[0]["subject"].startswith(ALERT_SUBJECT)
    assert "c2: 5 violations" in lines[1]["body"]


def test_smtp_channel_is_constructible_without_endpoint():
    """Constructing the mail transport must be free in an SMTP-less
    container (connection happens only inside send) — the delta_sink
    gating pattern applied to mail."""
    ch = SmtpAlertChannel("smtp.example.com", "dq@example.com", "ops@example.com")
    assert ch.host == "smtp.example.com" and ch.port == 25


def test_dq_quality_checks_wired_to_sink(spark, sf_dir):
    """End-to-end ST6: the REAL dq_quality_checks readout through the
    alert sink. The shipped suite is green on testdata, so nothing is
    sent; breaking one check (union an injected failing row, exactly what
    a drifted rollup would produce) must alert."""
    from pasardassist_spark.queries.quality import dq_quality_checks

    ch = RecordingChannel()
    checks = dq_quality_checks(spark, sf_dir)
    assert alert_on_failures(checks, ch) == [] and ch.sent == []

    broken = checks.unionByName(
        _checks(spark, [("rollup_count_reconciliation_injected", 42)])
    )
    out = alert_on_failures(broken, ch)
    assert [f["check"] for f in out] == ["rollup_count_reconciliation_injected"]
    assert "42 violations" in ch.sent[0][1]


def test_streaming_dq_alerts_per_batch(spark, sf_dir, tmp_path):
    """The foreachBatch adapter: a streaming check readout alerts on the
    batches whose checks fail and stays silent on green ones — and a
    failure in one batch does not suppress re-alerting in the next
    (the reference re-mails every interval)."""
    from pasardassist_spark.tables import load

    ev = load(spark, sf_dir, "events").limit(500)
    src_dir = str(tmp_path / "src")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src_dir + "/a"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src_dir + "/b"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    ch = RecordingChannel()

    def per_batch(batch_df, batch_id):
        # per-batch readout: duplicate-id check over THIS batch (always 0
        # here) plus an injected always-failing drift row, so every batch
        # both exercises a real aggregate and must re-alert
        readout = batch_df.agg(
            F.lit("batch_duplicate_ids").alias("check"),
            (F.count("event_id") - F.count_distinct("event_id"))
            .cast("long").alias("n_violations"),
        ).unionByName(_checks(spark, [("injected_drift", 1)]))
        dq_alert_sink(ch)(readout, batch_id)

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(ch.sent) == 2, "one alert per failing micro-batch"
    for _, body in ch.sent:
        assert "injected_drift: 1 violations" in body
        assert "batch_duplicate_ids" not in body
