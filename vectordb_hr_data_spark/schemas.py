"""Explicit StructTypes for the reference's HR entities (SURVEY.md §1.2).

The reference is schema-on-read (dict.get everywhere); the Spark engine
declares the schemas at the boundary and keeps the reference's
missing-field tolerance via nullable fields + coalesce in the expressions.

Fidelity trap (SURVEY.md §7.4 #2): ``education`` is a STRUCT for employees
but a plain STRING for jobs — same column name, different type — so the two
entities need separate schemas before the tagged union.
"""

from __future__ import annotations

from pyspark.sql import types as T

EDUCATION_STRUCT = T.StructType(
    [
        T.StructField("degree", T.StringType(), True),
        T.StructField("school", T.StringType(), True),
        T.StructField("graduation_year", T.IntegerType(), True),  # the only non-string leaf
    ]
)

EMPLOYEE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("position", T.StringType(), True),
        T.StructField("department", T.StringType(), True),
        T.StructField("join_date", T.StringType(), True),  # never date-typed in the reference
        T.StructField("skills", T.ArrayType(T.StringType()), True),
        T.StructField("projects", T.ArrayType(T.StringType()), True),
        T.StructField("education", EDUCATION_STRUCT, True),
        T.StructField("certifications", T.ArrayType(T.StringType()), True),
        T.StructField("languages", T.ArrayType(T.StringType()), True),
        T.StructField("profile_summary", T.StringType(), True),
    ]
)

JOB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("department", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("employment_type", T.StringType(), True),
        T.StructField("required_skills", T.ArrayType(T.StringType()), True),
        T.StructField("preferred_skills", T.ArrayType(T.StringType()), True),
        T.StructField("experience_years", T.StringType(), True),
        T.StructField("education", T.StringType(), True),  # STRING here, struct for employees
        T.StructField("responsibilities", T.ArrayType(T.StringType()), True),
        T.StructField("description", T.StringType(), True),
    ]
)

# the unified index row (FIXTURES.md §3): id, doc_type, document, embedding
# + flattened metadata (all strings after the scalarization rules)
def index_schema(dim: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("doc_type", T.StringType(), False),
            T.StructField("document", T.StringType(), True),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        ]
    )
