"""PySpark-native analytics engine with the query surface of the reference
coursework project (NYC rideshare analysis, /root/reference).

The reference is seven standalone PySpark scripts that each re-run a shared
enrichment "prelude" (fact CSV x2 left-join vs a zone dimension) and then one
analytics task (rollup, top-K-per-group, ratio-of-averages, daily anomaly,
band/equality filtering, pivoted route counts).  This package re-expresses
that surface as a composable, idiomatic Spark engine:

- ``session``    SparkSession factory (AQE, UTC, sane shuffle defaults)
- ``sources``    schema-explicit readers for the testdata star schema and the
                 reference-native rideshare CSV shape
- ``functions``  shared column expressions (exact money math, text, vectors)
- ``operators``  one module per operator family from SURVEY.md §2
- ``datapipe``   LLM-training-data extensions (dedup, similarity, text stats,
                 multimodal plumbing)
- ``streaming``  Structured Streaming counterparts (windowed aggs, sessions)
- ``plans``      plan-inspection helpers used by tests to pin physical plans

Every operator documents the reference site it models (file:line into
/root/reference) and the 100 TB scale strategy it adopts.
"""

__version__ = "0.1.0"
