"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ``takenkp/vectordb-hr-data`` (a ChromaDB +
sentence-transformers HR recommender), re-expressed Spark-first, plus the
LLM-data-pipeline operator family (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB batch scale.

Layout (SURVEY.md §7.0):
- ``session``    SparkSession factory tuned for local[32] tests / cluster parity
- ``schemas``    explicit StructTypes for HR entities + testdata tables
- ``io``         parquet/JSON sources, index sink
- ``functions``  column-expression libraries (vector math, text)
- ``operators``  each SURVEY.md §2 operator as a DataFrame -> DataFrame fn
- ``embed``      deterministic hash embedder (pandas_udf) + optional real model
- ``pipeline``   reference pipeline compositions (index build, query)
- ``streaming``  Structured Streaming variants of the events operators
"""

__version__ = "0.1.0"
