from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphene_spark import datagen  # noqa: E402
from graphene_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("graphene-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def dictionary_pdf():
    return datagen.make_entity_dictionary(n_entities=60, n_hot=4, seed=42)


@pytest.fixture(scope="session")
def transcripts_pdf():
    return datagen.make_transcripts(
        n_convs=20, turns_per_conv=15, n_entities=60, n_hot=4, seed=42
    )


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    return spark.createDataFrame(transcripts_pdf)


@pytest.fixture(scope="session")
def dictionary_df(spark, dictionary_pdf):
    from graphene_spark.pipeline import dictionary_to_spark

    return dictionary_to_spark(spark, dictionary_pdf)
