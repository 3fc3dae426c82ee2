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
    return parsed.select(
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
