"""A30 dump-utility tests: python helpers and JVM column forms agree."""

from pyspark.sql import functions as F

from rust_gd_spark.functions import dump


def test_python_dumps():
    assert dump.hexdump(b"\x0f\xa0") == "0fa0"
    assert dump.bitdump(b"\xa0") == "10100000"
    assert dump.bitdump(b"\x01\x80") == "0000000110000000"
    assert dump.hexdump(b"") == ""
    assert dump.bitdump(b"") == ""


def test_column_dumps_match_python(spark):
    payloads = [b"", b"\x00", b"\xff", b"\x0f\xa0\x01", bytes(range(16))]
    df = spark.createDataFrame([(p,) for p in payloads], "b binary")
    rows = df.select(
        "b", dump.hex_col("b").alias("h"), dump.bits_col("b").alias("bits")
    ).collect()
    for r in rows:
        assert r.h == dump.hexdump(bytes(r.b))
        assert r.bits == dump.bitdump(bytes(r.b))
