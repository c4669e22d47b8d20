"""msgraphdatapipelines_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of SMSAgentSoftware/MSGraphDataPipelines.

The reference (see SURVEY.md) is a PowerShell + T-SQL ETL sample that moves
Microsoft Graph REST collections into Azure SQL: paged OData extraction with
server-side projection/predicate pushdown, nested-struct and array flattening,
declared-schema projection with casting and null normalization, audit stamping
and full-refresh / retention-window load semantics.  This package re-expresses
every one of those operations Spark-first (DataFrame / Catalyst / Structured
Streaming) and extends them with the large-scale training-data-pipeline
operators a 100 TB deployment needs (dedup, similarity search, text analysis,
multimodal column plumbing).

Layout
------
- ``session``    — SparkSession builder tuned for the local test harness.
- ``schemas``    — declared StructTypes (SURVEY.md §1.4 entity schemas + fixtures).
- ``sources``    — paged REST/OData source with pushdown + retry (SURVEY.md §2.1).
- ``operators``  — flatten/argmax/projection + dedup/similarity/text/multimodal.
- ``functions``  — reusable Column helpers (JVM-side, no Python row UDFs).
- ``plans``      — plan-inspection helpers (pushdown / codegen assertions).
- ``sinks``      — overwrite / append+retention / stamp / surrogate key (§2.4).
- ``streaming``  — windowed aggregation, watermarks, sessionization (§2.5).
- ``pipelines``  — the entity registry pattern of SURVEY.md §3.2.
"""

__version__ = "0.1.0"
