"""Engine defaults mirroring the reference's ``config.py`` knobs
(reference ``config.py:13-27``), so a user of the reference finds the same
dials with the same meanings in the Spark engine.
"""

from __future__ import annotations

# reference MODEL_NAME (config.py:16) — used by the optional real encoder;
# tests and oracles use the deterministic hash embedder instead
MODEL_NAME = "all-MiniLM-L6-v2"
EMBEDDING_DIM = 384  # dim of MODEL_NAME's output (SURVEY.md §1.1)

# reference CHROMA_UPSERT_BATCH_SIZE (config.py:24) → Arrow UDF batch width
# (set as spark.sql.execution.arrow.maxRecordsPerBatch in session.py)
EMBED_BATCH_SIZE = 5000

# reference DEFAULT_NUM_RESULTS (config.py:27)
DEFAULT_NUM_RESULTS = 5

# reference collection name (config.py:22) → default index dataset name
DEFAULT_INDEX_NAME = "hr_job_embeddings_index_v2"

# distance semantics: ChromaDB default space 'l2' = SQUARED Euclidean
# (vector_db.py:100,107; SURVEY.md §4.2) — similarity rendered as
# 1 - distance (main.py:118), which may go negative
DISTANCE_METRIC = "l2sq"
