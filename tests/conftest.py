import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from rust_gd_spark.session import get_spark

    s = get_spark(app_name="rust_gd_spark_tests", cores=8, shuffle_partitions=16)
    yield s


@pytest.fixture(scope="session")
def small_corpus():
    from rust_gd_spark.fixtures import synth_transcripts

    return synth_transcripts(seed=42, n_conv=60, turns_per_conv=10)


@pytest.fixture(scope="session")
def transcripts_df(spark, small_corpus):
    from rust_gd_spark.fixtures import transcripts_spark

    df = transcripts_spark(spark, small_corpus)
    df.cache().count()
    return df
