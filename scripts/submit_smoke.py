"""spark-submit entry: proves the engine runs from the --py-files zip alone
(no repo checkout on the executors), per the north_rule ship format."""

from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()

from wiki_entity_linker_spark.operators.blocking import with_file_id  # noqa: E402
from wiki_entity_linker_spark.operators.dedup import exact_dedup  # noqa: E402

df = spark.createDataFrame(
    [("r1", "a.py", "c" * 40, "py", "x = 1"),
     ("r2", "b.py", "d" * 40, "py", "x = 1"),
     ("r3", "c.py", "e" * 40, "py", "y = 2")],
    "repo string, path string, commit string, lang string, content string",
)
out = exact_dedup(with_file_id(df), "file_id").collect()
groups = {r["file_id"]: r["group_size"] for r in out}
assert sorted(groups.values()) == [1, 2, 2], groups
print("SUBMIT_SMOKE_OK", len(out))
spark.stop()
