"""Column-level function library (all JVM-side ``pyspark.sql.functions``
compositions — no Python UDFs in any hot path)."""
