"""applyInPandasWithState health operator: totals must match the batch
truth, and state must carry across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def verdicts_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("verdicts") / "in")
    rows = [(f"c{i}", ["en", "es", "fr"][i % 3], i % 5 != 0) for i in range(900)]
    spark.createDataFrame(rows, "clip_id string, lang string, keep boolean").repartition(
        4
    ).write.mode("overwrite").parquet(d)
    return d


def test_lang_health_totals(spark, verdicts_dir, tmp_path):
    from kneaddata_spark.streaming.stateful_quality import lang_health

    src = spark.readStream.schema("clip_id string, lang string, keep boolean").option(
        "maxFilesPerTrigger", 1  # force MULTIPLE micro-batches -> state carries over
    ).parquet(verdicts_dir)
    q = (
        lang_health(src)
        .writeStream.format("memory")
        .queryName("lang_health")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # last emitted row per lang = final accumulated state
    final = {
        r["lang"]: r
        for r in spark.sql(
            "select * from (select *, row_number() over (partition by lang order by clips desc) rn "
            "from lang_health) where rn = 1"
        ).collect()
    }
    truth = {
        r["lang"]: r
        for r in spark.read.parquet(verdicts_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("clips"), F.sum((~F.col("keep")).cast("long")).alias("dropped"))
        .collect()
    }
    assert set(final) == set(truth)
    for lang in truth:
        assert final[lang]["clips"] == truth[lang]["clips"]
        assert final[lang]["dropped"] == truth[lang]["dropped"]
        assert final[lang]["drop_rate"] == pytest.approx(
            truth[lang]["dropped"] / truth[lang]["clips"]
        )
    # multiple micro-batches actually happened (state carried across them)
    assert spark.sql("select count(*) n from lang_health").collect()[0]["n"] > 3
