"""ripcurrent_spark — a PySpark-native CDC replication + data-masking
+ LLM-data-pipeline engine.

Re-expresses the capabilities of the reference engine (Ripcurrent:
Debezium CDC -> data classification -> masking rules -> replication;
see /root/reference/src/main/java/Main.java) as idiomatic Spark
DataFrame / SQL / Structured Streaming plans, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) such an engine needs at 100 TB.
"""

__version__ = "0.1.0"
