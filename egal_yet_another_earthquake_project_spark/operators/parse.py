"""Bronze → silver parsing: Kafka envelope / raw JSON → typed event rows.

Replaces the reference's decode-UDF → from_json → flatten → RDD-tuple-cast
chain (/root/reference/sparktoELKstream.py:77-126) with a single declarative
select: Catalyst sees every expression, so column pruning and JSON-field
pruning reach the scan, and there is no Python worker per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import functions as EF
from egal_yet_another_earthquake_project_spark.schemas import EARTHQUAKE_RAW


def decode_envelope(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka binary envelope → ``ascii_value`` string column (F3, P1).

    Reference: per-row UDF ``bytearray(x).decode('utf-8')``
    (/root/reference/sparktoELKstream.py:77-79); here a codegen'd cast.
    """
    return df.withColumn("ascii_value", EF.decode_utf8(value_col))


def parse_events_raw(df: DataFrame, json_col: str = "ascii_value") -> DataFrame:
    """JSON string → 15 raw string columns (F1, P2).

    Mirrors from_json + ``select("parsed.*")``
    (/root/reference/sparktoELKstream.py:97-98) with the explicit raw schema.
    """
    return df.select(
        F.from_json(F.col(json_col), EARTHQUAKE_RAW).alias("e")
    ).select("e.*")


def _dbl(name: str) -> Column:
    # try_cast: malformed numerics → null, not a failed job (ANSI-safe).
    return F.expr(f"try_cast({name} AS double)").alias(name)


def typed_events(df: DataFrame) -> DataFrame:
    """Raw 15-string frame → typed 17-column silver frame (P7, F2, F4, F5, F11).

    The reference does this as a 17-ary RDD tuple map with ``float()`` casts
    (/root/reference/sparktoELKstream.py:103-105) feeding an all-string
    schema (:107-125); here it is one typed select. Column order matches the
    reference's enriched schema. ``fault_line`` is attached separately by
    :func:`egal_yet_another_earthquake_project_spark.operators.enrich.with_fault_line`.
    """
    return df.select(
        EF.minute_bucket(EF.null_safe_timestamp("date")).alias("date"),
        "country",
        "province",
        "district",
        "neighborhood",
        "location",
        _dbl("depth"),
        "type",
        _dbl("magnitude"),
        _dbl("longitude"),
        _dbl("latitude"),
        F.expr("try_cast(eventID AS long)").alias("eventID"),
        EF.point_location("latitude", "longitude").alias("pointLocation"),
        _dbl("rms"),
        F.expr("try_cast(isEventUpdate AS boolean)").alias("isEventUpdate"),
        F.try_to_timestamp("lastUpdateDate").alias("lastUpdateDate"),
    )


def to_reference_view(df: DataFrame) -> DataFrame:
    """Cast the typed silver frame back to the reference's all-string schema
    (/root/reference/sparktoELKstream.py:107-125) for byte-parity tests and
    string-typed sinks. Engine-internal consumers never use this."""
    out = df
    for field in df.schema.fields:
        if field.dataType.simpleString() == "timestamp":
            out = out.withColumn(field.name, EF.minute_string(field.name))
        elif field.dataType.simpleString() != "string":
            out = out.withColumn(field.name, F.col(field.name).cast("string"))
    return out


def parse_json_props(df: DataFrame, json_col: str, schema, prefix: str = "") -> DataFrame:
    """Generic JSON-parse helper: parse ``json_col`` with ``schema`` and
    flatten the struct to top-level (optionally prefixed) columns."""
    parsed = df.withColumn("_parsed", F.from_json(F.col(json_col), schema))
    for field in schema.fields:
        parsed = parsed.withColumn(prefix + field.name, F.col(f"_parsed.{field.name}"))
    return parsed.drop("_parsed")


def quarantine_split(
    df: DataFrame, json_col: str = "ascii_value"
) -> tuple[DataFrame, DataFrame]:
    """Route malformed payloads to a quarantine side instead of silently
    nulling them — the dead-letter discipline the reference's pipeline
    lacks entirely (a bad Kafka record there becomes an all-null row or
    a crashed executor).

    ``from_json`` is PERMISSIVE: an unparseable document yields an
    all-NULL struct — indistinguishable from a legitimately empty one.
    The split therefore parses with ``columnNameOfCorruptRecord``, which
    captures the offending text in a ``_corrupt`` field only when the
    parse failed; branching on it gives two frames off ONE shared parse
    subplan:

    * ok — the parsed ``EARTHQUAKE_RAW`` columns (same shape as
      :func:`parse_events_raw`);
    * quarantine — the ORIGINAL payload plus a ``reason`` column
      (``null_payload`` / ``unparseable_json``), so the record can be
      replayed after a parser fix — data is never destroyed by a schema
      mismatch.

    Pure column logic — both sides stay co-partitioned with the input
    and the filters push into the shared scan. In streaming, drive both
    sides from one ``foreachBatch`` (write ok to silver, quarantine to
    the dead-letter path) so the batch is read once.
    """
    from pyspark.sql import types as T

    with_corrupt = T.StructType(
        [*EARTHQUAKE_RAW.fields, T.StructField("_corrupt", T.StringType(), True)]
    )
    parsed = df.withColumn(
        "_e",
        F.from_json(
            F.col(json_col),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    null_in = F.col(json_col).isNull() | (F.trim(F.col(json_col)) == "")
    is_bad = null_in | F.col("_e").isNull() | F.col("_e._corrupt").isNotNull()
    ok = parsed.filter(~is_bad).select("_e.*").drop("_corrupt")
    bad = parsed.filter(is_bad).select(
        F.col(json_col).alias("payload"),
        F.when(null_in, F.lit("null_payload"))
        .otherwise(F.lit("unparseable_json"))
        .alias("reason"),
    )
    return ok, bad
