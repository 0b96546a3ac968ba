import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from jcf_nb_migration_spark import get_spark

    spark = get_spark("tests", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4",
                                  "spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck_small():
    from jcf_nb_migration_spark.testing import duckdb_with_views

    return duckdb_with_views(SF_SMALL)
