"""Real-Kinesis integration — stream admin (Table A A3-A6) + source factory.

The reference's producer main (Prod:62-120) does describe/create/wait/list
against the Kinesis control plane before producing. Those are *admin*
operations with no Spark analog (SURVEY.md §2 A3-A6) — they live here as
boto3 utilities behind an import-try, because AWS is out of test scope
(SURVEY.md §7: no AWS in CI).

The data-plane source uses the public awslabs spark-sql-kinesis-connector
(format "aws-kinesis") when its jar is on the classpath; the envelope it
emits matches streaming.envelope.ENVELOPE_SCHEMA.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

try:
    import boto3  # type: ignore

    HAVE_BOTO3 = True
except ImportError:
    boto3 = None
    HAVE_BOTO3 = False

DEFAULT_SHARDS = 2  # the reference's myStreamSize (Prod:66)
WAIT_TIMEOUT_S = 600  # 10-min deadline (Prod:144-146)
POLL_INTERVAL_S = 10


def _resolve_client(region: str, client=None):
    """Return the injected client or build a real boto3 one.

    Injection is what makes A3-A6 unit-testable without AWS (SURVEY §7:
    no AWS in CI): tests pass a stub with the same call surface
    (describe_stream / create_stream / list_streams + an ``exceptions``
    namespace), while production callers omit it and get boto3."""
    if client is not None:
        return client
    if not HAVE_BOTO3:
        raise RuntimeError(
            "boto3 is not installed in this environment; Kinesis admin "
            "operations are only available where AWS connectivity exists"
        )
    return boto3.client("kinesis", region_name=region)


def ensure_stream(
    name: str, region: str, shards: int = DEFAULT_SHARDS, *, client=None
) -> None:
    """A3+A4: describe; create with ``shards`` if missing; error if the
    stream is DELETING (Prod:68-101)."""
    client = _resolve_client(region, client)
    try:
        desc = client.describe_stream(StreamName=name)
        status = desc["StreamDescription"]["StreamStatus"]
        if status == "DELETING":
            raise RuntimeError(f"stream {name} is being deleted")
        if status != "ACTIVE":
            wait_for_active(name, region, client=client)
        return
    except client.exceptions.ResourceNotFoundException:
        client.create_stream(StreamName=name, ShardCount=shards)
        wait_for_active(name, region, client=client)


def wait_for_active(
    name: str,
    region: str,
    timeout_s: int = WAIT_TIMEOUT_S,
    *,
    poll_interval_s: float = POLL_INTERVAL_S,
    client=None,
) -> None:
    """A5: bounded poll until ACTIVE (Prod:140-167)."""
    client = _resolve_client(region, client)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            desc = client.describe_stream(StreamName=name)
            if desc["StreamDescription"]["StreamStatus"] == "ACTIVE":
                return
        except client.exceptions.ResourceNotFoundException:
            pass
        time.sleep(poll_interval_s)
    raise TimeoutError(f"stream {name} never went active within {timeout_s}s")


def list_streams(region: str, page_size: int = 10, *, client=None) -> list[str]:
    """A6: paginated catalog listing — the reference walks pages of 10 via
    the exclusiveStartStreamName cursor (Prod:103-120); same loop here."""
    client = _resolve_client(region, client)
    names: list[str] = []
    kwargs = {"Limit": page_size}
    while True:
        resp = client.list_streams(**kwargs)
        names.extend(resp["StreamNames"])
        if not resp.get("HasMoreStreams"):
            return names
        kwargs["ExclusiveStartStreamName"] = names[-1]


def kinesis_source(
    spark: SparkSession,
    stream: str,
    region: str,
    starting_position: str = "LATEST",
) -> DataFrame:
    """A7: the consumer-side source. Requires the awslabs
    spark-sql-kinesis-connector jar; raises with guidance otherwise.
    Spark's driver (offset tracking + task scheduling) replaces the whole
    KCL Scheduler/lease/DynamoDB machinery (Cons:70-84)."""
    try:
        return (
            spark.readStream.format("aws-kinesis")
            .option("kinesis.streamName", stream)
            .option("kinesis.region", region)
            .option("kinesis.consumerType", "GetRecords")
            .option("kinesis.startingPosition", starting_position)
            .load()
        )
    except Exception as exc:  # connector jar absent
        raise RuntimeError(
            "Kinesis connector not on classpath; add the "
            "spark-sql-kinesis-connector jar, or use "
            "sources.files.replay_events_stream for local development"
        ) from exc
