"""MLlib text-analysis pipeline (SURVEY.md B6): Tokenizer →
StopWordsRemover → CountVectorizer → IDF, plus TF-IDF top terms per
document. The expression-level text ops (querydefs/text_queries.py) cover
the oracle-checkable analytics; this is the MLlib feature-engineering
path that feeds model training.
"""

from __future__ import annotations

import pandas as pd

from pyspark.ml import Pipeline
from pyspark.ml.feature import CountVectorizer, IDF, RegexTokenizer, StopWordsRemover

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fit_tfidf(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1 << 16,
    min_df: float = 2.0,
):
    """Fit the tokenize→stop-remove→count→idf pipeline; returns the fitted
    PipelineModel (its CountVectorizerModel exposes the vocabulary)."""
    pipeline = Pipeline(
        stages=[
            RegexTokenizer(inputCol=text_col, outputCol="_toks", pattern=r"\s+"),
            StopWordsRemover(inputCol="_toks", outputCol="_filtered"),
            CountVectorizer(inputCol="_filtered", outputCol="_tf", vocabSize=vocab_size, minDF=min_df),
            IDF(inputCol="_tf", outputCol="tfidf"),
        ]
    )
    return pipeline.fit(docs)


def top_terms_per_doc(docs: DataFrame, model, id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """(doc_id, term, tfidf) for each document's k highest-weighted terms.

    The sparse vector unpacks in a pandas_udf (vector → top-k index/value
    pairs), then the vocabulary array maps indices to terms via a literal
    lookup — vocabulary is bounded by vocabSize, so the literal stays
    broadcast-sized.
    """
    from pyspark.ml.functions import vector_to_array

    vocab = model.stages[2].vocabulary

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("idx", T.IntegerType()),
        T.StructField("weight", T.DoubleType()),
    ])))
    def topk(vecs: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for v in vecs:
            arr = np.asarray(v, dtype=np.float64)
            if not arr.any():
                out.append([])
                continue
            top = np.argsort(-arr)[:k]
            out.append([(int(i), float(arr[i])) for i in top if arr[i] > 0])
        return pd.Series(out)

    # VectorUDT doesn't cross the Arrow boundary; densify to array<double>
    # first (bounded: callers restrict the doc set before transform)
    scored = model.transform(docs).select(
        id_col, topk(vector_to_array(F.col("tfidf"))).alias("top")
    )
    vocab_arr = F.lit(vocab)
    return (
        scored.select(id_col, F.explode("top").alias("t"))
        .select(
            id_col,
            F.element_at(vocab_arr, F.col("t.idx") + 1).alias("term"),
            F.round(F.col("t.weight"), 6).alias("tfidf"),
        )
    )
