"""Debezium change-event envelope model.

Wire format (reference consumes it in Main.java:165-190): a JSON value
``{"payload": {"op", "ts_ms", "source": {"db"|"schema"|"keyspace",
"table"}, "before", "after"}}`` plus a JSON key whose
``Schema.fields[0].field`` names the primary-key column
(Main.java:183-189 — note the capital-S "Schema").

Payload row fields are kept as ``map<string,string>`` — the reference
forces string representations too (``decimal.handling.mode=string``,
``binary.handling.mode=base64``, Main.java:143-144); typed decoding is
a separate, explicit step (cdc/decode.py), mirroring the reference's
schema-driven conversion pass (Main.java:196-232).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SOURCE = T.StructType(
    [
        T.StructField("db", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("source", _SOURCE),
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField("ddl", T.StringType()),  # schema-change events
    ]
)

ENVELOPE_SCHEMA = T.StructType([T.StructField("payload", PAYLOAD_SCHEMA)])

# Key envelope: Schema.fields[0].field = PK column name (Main.java:185).
KEY_SCHEMA = T.StructType(
    [
        T.StructField(
            "Schema",
            T.StructType(
                [
                    T.StructField(
                        "fields",
                        T.ArrayType(
                            T.StructType([T.StructField("field", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType())),
    ]
)


def build_envelope_json(
    df: DataFrame,
    op: Column,
    ts_ms: Column,
    table: str,
    key_col: str,
    before: Column,
    after: Column,
    db: str = "testdb",
    schema: str = "public",
) -> DataFrame:
    """Serialize rows into Debezium-style (key, value) JSON strings —
    the producer twin of :func:`parse_envelope` (used by tests and the
    streaming fixtures; a real deployment would read Kafka topics
    already in this shape)."""
    payload = F.struct(
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.lit(db).alias("db"), F.lit(schema).alias("schema"), F.lit(table).alias("table")
        ).alias("source"),
        before.alias("before"),
        after.alias("after"),
        F.lit(None).cast("string").alias("ddl"),
    )
    key = F.struct(
        F.struct(
            F.array(F.struct(F.lit(key_col).alias("field"))).alias("fields")
        ).alias("Schema"),
        F.map_from_arrays(
            F.array(F.lit(key_col)), F.array(F.col(key_col).cast("string"))
        ).alias("payload"),
    )
    return df.select(
        F.to_json(key).alias("key"),
        F.to_json(F.struct(payload.alias("payload"))).alias("value"),
    )


def parse_envelope(df: DataFrame, value_col: str = "value", key_col: str = "key") -> DataFrame:
    """Parse JSON change events into typed envelope columns.

    Output: op, ts_ms, db, schema, table, before, after, ddl,
    key_field (PK column name from the key schema), key_value, and
    row_payload = before for deletes else after (Main.java:171-178).
    """
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), ENVELOPE_SCHEMA))
    if key_col in df.columns:
        parsed = parsed.withColumn("_key", F.from_json(F.col(key_col), KEY_SCHEMA))
        key_field = F.col("_key.Schema.fields")[0]["field"]
        key_value = F.element_at(F.col("_key.payload"), key_field)
    else:
        key_field = F.lit(None).cast("string")
        key_value = F.lit(None).cast("string")
    p = F.col("_env.payload")
    # value_schema_fields (embedded-schema decode) and "_"-prefixed
    # provenance columns (Kafka _topic/_partition/_offset) pass through.
    extra = [
        F.col(c)
        for c in df.columns
        if c == "value_schema_fields" or c.startswith("_")
    ]
    return parsed.select(
        *extra,
        p["op"].alias("op"),
        p["ts_ms"].alias("ts_ms"),
        p["source"]["db"].alias("db"),
        p["source"]["schema"].alias("schema"),
        p["source"]["table"].alias("table"),
        p["before"].alias("before"),
        p["after"].alias("after"),
        p["ddl"].alias("ddl"),
        key_field.alias("key_field"),
        key_value.alias("key_value"),
        F.when(p["op"] == "d", p["before"]).otherwise(p["after"]).alias("row_payload"),
    )


# Value-side embedded schema: schema.fields[0].fields = the row field
# descriptors ({field, type, name}) the reference walks to find logical
# date/time columns (Main.java:190-232).
VALUE_SCHEMA = T.StructType(
    [
        T.StructField(
            "schema",
            T.StructType(
                [
                    T.StructField(
                        "fields",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "fields",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField("field", T.StringType()),
                                                    T.StructField("type", T.StringType()),
                                                    T.StructField("name", T.StringType()),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    )
                ]
            ),
        )
    ]
)


def with_value_schema_fields(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Attach ``value_schema_fields`` (array<struct<field,type,name>>)
    parsed from the event's embedded Connect schema."""
    vs = F.from_json(F.col(value_col), VALUE_SCHEMA)
    return df.withColumn("value_schema_fields", vs["schema"]["fields"][0]["fields"])


def schema_driven_decode(parsed: DataFrame, payload_col: str = "row_payload") -> DataFrame:
    """Decode logical date/time values IN PLACE, driven by the event's
    own schema — the reference's conversion pass (Main.java:196-232):
    a field whose descriptor names ``io.debezium.time.Date`` /
    ``MicroTime`` / ``Timestamp`` is rewritten from its wire integer
    to the ISO string form; everything else passes through.

    Pure Column expressions: per entry, the (small) descriptor array is
    probed for the field's logical name; no Python, no extra shuffle —
    the decode rides the same scan/projection as the parse.
    """
    from ripcurrent_spark.cdc.decode import (
        epoch_days_to_date,
        epoch_ms_to_datetime,
        micros_of_day_to_time,
    )

    fields = F.col("value_schema_fields")

    def _decode_entry(k: Column, v: Column) -> Column:
        matches = F.filter(fields, lambda f: f["field"] == k)
        lname = F.when(F.size(matches) > 0, matches[0]["name"])
        return (
            F.when(v.isNull(), v)
            .when(lname == "io.debezium.time.Date", epoch_days_to_date(v).cast("string"))
            .when(lname == "io.debezium.time.MicroTime", micros_of_day_to_time(v))
            .when(
                lname == "io.debezium.time.Timestamp",
                epoch_ms_to_datetime(v),
            )
            .otherwise(v)
        )

    decoded = F.map_from_entries(
        F.transform(
            F.map_entries(F.col(payload_col)),
            lambda e: F.struct(e["key"].alias("key"), _decode_entry(e["key"], e["value"]).alias("value")),
        )
    )
    return parsed.withColumn(payload_col, F.when(F.col(payload_col).isNotNull(), decoded))


def split_dead_letters(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Separate well-formed change events from dead letters.

    ``from_json`` is PERMISSIVE: malformed JSON or a missing payload
    yields null envelope columns instead of failing the job (the
    reference's per-record try/catch, Main.java:165-167 — but here bad
    records are ROUTED, not just logged: the second frame feeds a
    quarantine sink for replay)."""
    ok = parsed.filter(F.col("op").isNotNull() | F.col("ddl").isNotNull())
    dead = parsed.filter(F.col("op").isNull() & F.col("ddl").isNull())
    return ok, dead
