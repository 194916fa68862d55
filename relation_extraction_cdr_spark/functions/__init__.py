"""Scalar column functions (text, quality, similarity).

Everything here is either a pure ``pyspark.sql.functions`` composition
(JVM-side, whole-stage-codegen) or an Arrow-batched pandas UDF; there are
no per-row Python UDFs anywhere in the engine (BASELINE input_hint).
"""
