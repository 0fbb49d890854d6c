"""Scalar function library (SURVEY.md §2.8 F1-F21).

Column-expression implementations (JVM-side, codegen-friendly) in
``scalars``; pandas-UDF implementations of the genuinely branchy
functions (URL canonicalization F9, name heuristics F14/F15) in
``text`` and ``urls``.
"""

from tiki_data_pipeline_spark.functions import scalars  # noqa: F401
