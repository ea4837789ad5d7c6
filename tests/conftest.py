from __future__ import annotations

import pytest

from dense_retriever_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="dense-retriever-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    from dense_retriever_spark.corpus import ingest, synth_corpus

    return ingest(synth_corpus(spark, 200)).cache()


@pytest.fixture(scope="session")
def tiny_queries(spark):
    from dense_retriever_spark.corpus import synth_queries

    return synth_queries(spark, 30).cache()
