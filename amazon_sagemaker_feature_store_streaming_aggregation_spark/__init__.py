"""PySpark-native streaming feature-aggregation engine.

A from-scratch re-expression of the query/data-processing capabilities of
``aws-samples/amazon-sagemaker-feature-store-streaming-aggregation`` on
idiomatic Apache Spark:

* batch trailing-window feature aggregation (DataFrame/Spark SQL window
  functions over time-RANGE frames) — reference
  ``notebooks/2_batch_ingestion.ipynb:271-287``;
* an online feature-store abstraction (latest-record-per-key keyed table
  with upsert + point lookup) — reference
  ``notebooks/schema/cc-agg-fg-schema.json``,
  ``src/lambda/StreamingIngestAggFeatures/lambda_function.py:25-32``;
* continuous sliding-window aggregation over an event stream
  (Structured Streaming, stateful per-event trailing windows) — reference
  ``notebooks/1_setup.ipynb:466-478`` (Kinesis Data Analytics SQL);
* stream enrichment with point-lookup joins, staleness cutoffs, guarded
  ratio features and model scoring — reference
  ``src/lambda/InvokeFraudEndpointLambda/lambda_function.py``;
* plus large-scale training-data-pipeline operators (deduplication,
  similarity search, text analysis, multimodal column plumbing) designed
  for 100 TB-scale inputs.

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"

from .session import get_spark, local_rows  # noqa: F401
