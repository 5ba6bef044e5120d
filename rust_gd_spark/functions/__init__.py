"""Scalar/column function families for training-data pipelines.

``textstats`` — token counting, quality scoring, language-ID, document
fingerprinting. Everything here is built from native pyspark.sql.functions
(JVM-side, whole-stage codegen; no Python in the hot path) and is
deliberately ANSI-SQL-expressible so the DuckDB oracle can replay the exact
computation (`__spark_entry__.py` contract).
"""
