"""SentencePiece-style vocab scan (SURVEY §2.1 S5).

Reference semantics (models/tokenization.py:72-85): the vocab file is
TSV lines ``token\tscore``; the token is the first field, stripped; its
id is the 0-based line index; a token repeated on a later line keeps the
LATER id (OrderedDict overwrite) while indices keep advancing.  The
reference hard-requires exactly two fields per line — this reader takes
the first field and tolerates extra tabs (a strict superset).

This is a dimension-table load (a vocab is tens of thousands of rows):
read once with file order preserved, then broadcast — either as a
DataFrame joined with F.broadcast, or collapsed to a plain dict carried
into the tokenizer UDF closure (the S4 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_vocab(spark: SparkSession, path: str) -> DataFrame:
    """(token string, token_id long) with file line order preserved.

    Single-split textFile + zipWithIndex: zipWithIndex on one split is
    the only DataFrame-adjacent primitive that guarantees line numbers
    equal file order (monotonically_increasing_id does not across
    splits); acceptable here because a vocab is a small dimension file.
    """
    rdd = spark.sparkContext.textFile(path, 1).zipWithIndex()
    rows = rdd.map(lambda t: (t[0].split("\t")[0].strip(), t[1]))
    return spark.createDataFrame(rows, "token string, token_id long")


def vocab_dict(vocab: DataFrame) -> dict[str, int]:
    """Driver-side {token: id} for broadcasting into tokenizer UDFs.

    Duplicate tokens keep the LAST id (reference OrderedDict overwrite,
    tokenization.py:83): ordering by token_id before collapsing makes
    the later line win deterministically.
    """
    return {r["token"]: r["token_id"] for r in vocab.orderBy("token_id").collect()}
