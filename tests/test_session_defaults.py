"""Session defaults are load-bearing — lock them in so they can't
regress silently:

- ReservedCodeCacheSize=512m (round-2 find: the default 240 MB cache
  fills with codegen classes mid-run and collapses throughput 2.5-6x);
- AQE + skew-join (the merge join's skew defense);
- parquet NTZ inference off (naive timestamps must read as TIMESTAMP or
  every schema comparison breaks);
- Arrow on (the pandas-UDF policy depends on it).
"""


def test_session_defaults(spark):
    conf = spark.conf
    assert "-XX:ReservedCodeCacheSize=512m" in conf.get(
        "spark.driver.defaultJavaOptions"
    )
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
