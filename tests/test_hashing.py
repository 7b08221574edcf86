"""Pure-Python XXH64 twin must match Spark's xxhash64 exactly."""

import random
import string

from pyspark.sql import functions as F

from xrpl_rich_list_py_crawler_spark.functions.hashing import spark_xxhash64_str


def test_xxhash64_matches_spark(spark):
    rng = random.Random(42)
    samples = ["", "a", "-", "https://h1.example1.com/p/42?a=1&b=2", "x" * 31,
               "y" * 32, "z" * 100, "日本語テキスト"]
    for _ in range(200):
        n = rng.randint(0, 64)
        samples.append("".join(rng.choices(string.printable, k=n)))
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert spark_xxhash64_str(s) == got[s]
