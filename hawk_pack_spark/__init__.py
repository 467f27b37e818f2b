"""hawk_pack_spark — a PySpark-native analytics & vector-search engine.

A from-scratch re-expression of the capabilities of the reference HNSW
vector-search engine (Inversed-Tech/hawk-pack, surveyed in SURVEY.md) as
idiomatic Spark DataFrame programs, plus the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns)
required for 100 TB-scale training-data processing.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC).
- ``config``     : HNSW parameters (reference: src/hawk_searcher.rs:39-129).
- ``sources``    : fixture/table loaders and schemas.
- ``functions``  : distance & text scalar expressions (JVM-side Columns).
- ``operators``  : exact kNN, top-k, HNSW build/search, dedup, similarity.
- ``streaming``  : Structured Streaming ingest (two-phase insert).
- ``multimodal`` : binary-column plumbing with stubbed codecs.
"""

__version__ = "0.1.0"
