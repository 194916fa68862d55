from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")


@pytest.fixture(scope="session")
def spark():
    from relation_extraction_cdr_spark.session import spark_session

    s = spark_session("pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def fixtures(spark):
    """(pages, gold_mentions, gold_relations) at 60 docs, seed 42."""
    from relation_extraction_cdr_spark import datagen

    pages, gm, gr = datagen.gen_fixture_dfs(spark, 60)
    return pages.cache(), gm.cache(), gr.cache()


@pytest.fixture(scope="session")
def mesh(spark):
    from relation_extraction_cdr_spark import datagen

    return datagen.mesh_df(spark).cache()
