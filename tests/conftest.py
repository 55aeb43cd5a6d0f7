import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuousfilteringbenchmark_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cfb_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def cc_corpus(spark):
    from continuousfilteringbenchmark_spark.fixtures import clean_clean_corpus

    c = clean_clean_corpus(spark, n_entities=200)
    c.docs.cache().count()
    c.gold_pairs.cache().count()
    return c


@pytest.fixture(scope="session")
def dirty(spark):
    from continuousfilteringbenchmark_spark.fixtures import dirty_corpus

    c = dirty_corpus(spark, n_entities=150)
    c.docs.cache().count()
    c.gold_pairs.cache().count()
    return c
