"""M4: additive schema evolution (FIXTURES.md F5) — new data fields appearing
mid-stream widen the table; pre-evolution rows read back null."""

from pyspark.sql import functions as F

from airbyte_module_spark import model
from airbyte_module_spark.lake.table import LakeTable
from airbyte_module_spark.sources.generator import FeedSpec, generate_feed
from airbyte_module_spark.streaming.pipeline import CdcPipeline
from airbyte_module_spark.oracle import apply_events


def test_evolution_adds_columns_with_inferred_types(spark, tmp_path):
    feed = str(tmp_path / "feed")
    events = generate_feed(
        FeedSpec(seed=31, n_events=300, n_shards=6, evolution_after=80), feed
    )
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    pipe = CdcPipeline(table)
    pipe.replay_stream(feed, str(tmp_path / "ck"), max_files_per_trigger=2)

    schema = {f.name: f.dataType.simpleString() for f in table.schema().fields}
    assert schema.get("branch") == "string"
    assert schema.get("size") == "bigint"

    actual = (
        table.read()
        .select("repo", "path", "branch", "size")
        .orderBy("repo", "path")
        .toPandas()
    )
    expected = apply_events(events)
    exp = expected.set_index(["repo", "path"])
    for row in actual.itertuples(index=False):
        e = exp.loc[(row.repo, row.path)]
        if "branch" in exp.columns and isinstance(e.get("branch"), str):
            assert row.branch == e["branch"]
            assert int(row.size) == int(e["size"])
        else:
            assert row.branch is None


def test_pre_evolution_files_null_fill(spark, tmp_path):
    """Rows written before evolve() must read back null for new columns —
    no rewrite happened (entry dirs unchanged)."""
    import pyspark.sql.types as T

    feed = str(tmp_path / "feed")
    generate_feed(FeedSpec(seed=32, n_events=100, n_shards=1), feed)
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    CdcPipeline(table).replay_batch(feed)
    dirs_before = sorted(e["dir"] for e in table.current_snapshot()["entries"])

    table.evolve([T.StructField("stars", T.LongType(), True)])
    dirs_after = sorted(e["dir"] for e in table.current_snapshot()["entries"])
    assert dirs_before == dirs_after, "evolution must not rewrite data"
    assert table.read().filter(F.col("stars").isNotNull()).count() == 0
    assert "stars" in table.read().columns
