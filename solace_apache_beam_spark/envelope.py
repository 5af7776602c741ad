"""Message-envelope data model (SURVEY.md §1.2, FIXTURES.md §1).

The reference has no schema system: each element type is defined by an
``InboundMessageMapper<T>`` over a raw ``BytesXMLMessage``
(SolaceIO.java:59-62). The Spark-native equivalent is one fixed envelope
``StructType`` emitted by the source; every record shape the reference
ships (SolaceTextRecord.java:21-34, SolaceTestRecord.java:18-32,
SolaceByteBuffRecord.java:16-17) is a projection of it.

``events_to_envelope`` adapts the driver-generated ``events`` table into
the envelope so batch queries can stand in for the broker feed
(TESTDATA.md), exactly like the reference's tests feed synthetic
"<queue> - <i>" messages (SolaceIOIT.java:490-497).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("destination", T.StringType(), False),
        T.StructField("message_id", T.LongType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("priority", T.IntegerType(), True),
        T.StructField("redelivered", T.BooleanType(), False),
        T.StructField("reply_to", T.StringType(), True),
        T.StructField("receive_timestamp", T.TimestampType(), False),
        T.StructField("sender_timestamp", T.TimestampType(), True),
        T.StructField("sender_id", T.StringType(), True),
        T.StructField("sequence_number", T.LongType(), True),
        T.StructField("expiration", T.LongType(), True),
        T.StructField("ttl", T.LongType(), True),
    ]
)


def events_to_envelope(events: DataFrame) -> DataFrame:
    """Project the synthetic ``events`` table onto the message envelope.

    destination <- queue per event_type (one queue binding per split,
    UnboundedSolaceSource.java:50-61); payload <- props JSON string;
    sender/receive timestamp <- ts (sender-timestamp mode,
    UnboundedSolaceReader.java:185-195).
    """
    return events.select(
        F.concat(F.lit("Q/"), F.col("event_type")).alias("destination"),
        F.col("event_id").alias("message_id"),
        F.col("props").alias("payload"),
        F.create_map(F.lit("user_id"), F.col("user_id").cast("string")).alias(
            "properties"
        ),
        F.lit(0).alias("priority"),
        F.lit(False).alias("redelivered"),
        F.lit(None).cast("string").alias("reply_to"),
        F.col("ts").alias("receive_timestamp"),
        F.col("ts").alias("sender_timestamp"),
        F.concat(F.lit("user-"), F.col("user_id")).alias("sender_id"),
        F.col("event_id").alias("sequence_number"),
        F.lit(0).cast("long").alias("expiration"),
        F.lit(0).cast("long").alias("ttl"),
    )


def event_time(
    use_sender_timestamp: bool = True,
) -> F.Column:
    """Element-time assignment: sender timestamp if enabled and present,
    else arrival time (UnboundedSolaceReader.java:185-195; option default
    false, SolaceIO.java:28)."""
    if use_sender_timestamp:
        return F.coalesce(F.col("sender_timestamp"), F.col("receive_timestamp")).alias(
            "event_time"
        )
    return F.col("receive_timestamp").alias("event_time")
