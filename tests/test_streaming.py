"""M3: Structured Streaming tail — checkpointed availableNow replay, resume
after new data, restart idempotence (SURVEY.md §2.8 T1/T2)."""

import shutil

from airbyte_module_spark.lake.table import LakeTable
from airbyte_module_spark.sources.generator import FeedSpec, generate_feed
from airbyte_module_spark.streaming.pipeline import CdcPipeline
from tests.util import assert_matches_oracle


def test_streaming_replay_matches_oracle(spark, tmp_path):
    feed = str(tmp_path / "feed")
    events = generate_feed(FeedSpec(seed=21, n_events=300, n_shards=6), feed)
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    pipe = CdcPipeline(table)
    pipe.replay_stream(feed, str(tmp_path / "ck"), max_files_per_trigger=2)
    assert_matches_oracle(table, events)
    # multiple micro-batches actually happened (maxFilesPerTrigger honored)
    assert len(table.current_snapshot()["applied_batches"]) >= 3


def test_streaming_resume_from_checkpoint(spark, tmp_path):
    """Feed arrives in two stages; the second run resumes from the checkpoint
    and only processes new shards. Final state equals a one-shot replay."""
    staged = tmp_path / "staged"
    events = generate_feed(FeedSpec(seed=22, n_events=300, n_shards=6), str(staged))
    live = tmp_path / "live"
    live.mkdir()
    for i in range(3):
        shutil.copy(staged / f"shard-{i:05d}.json", live / f"shard-{i:05d}.json")

    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    pipe = CdcPipeline(table)
    ck = str(tmp_path / "ck")
    pipe.replay_stream(str(live), ck, max_files_per_trigger=2)
    batches_stage1 = dict(table.current_snapshot()["applied_batches"])

    for i in range(3, 6):
        shutil.copy(staged / f"shard-{i:05d}.json", live / f"shard-{i:05d}.json")
    pipe.replay_stream(str(live), ck, max_files_per_trigger=2)

    # resumed, not reprocessed: stage-1 batch ids still map to their versions
    for k, v in batches_stage1.items():
        assert table.current_snapshot()["applied_batches"][k] == v
    assert_matches_oracle(table, events)

    # a third run with no new data must change nothing
    digest = table.digest()
    pipe.replay_stream(str(live), ck, max_files_per_trigger=2)
    assert table.digest() == digest


def test_restart_after_sink_crash_is_exactly_once(spark, tmp_path):
    """Simulate a crash after the table commit but before the checkpoint
    commit: the batch is re-delivered on restart and must be skipped by the
    (checkpoint_id, batch_id) dedup — digest unchanged."""
    feed = str(tmp_path / "feed")
    events = generate_feed(FeedSpec(seed=23, n_events=200, n_shards=4), feed)
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=8)
    pipe = CdcPipeline(table)
    ck = str(tmp_path / "ck")

    crashed = {"done": False}
    orig = pipe.apply_batch

    def crashing(raw, batch_id=0, checkpoint_id="adhoc"):
        out = orig(raw, batch_id=batch_id, checkpoint_id=checkpoint_id)
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after table commit")
        return out

    pipe.apply_batch = crashing
    try:
        pipe.replay_stream(feed, ck, max_files_per_trigger=1)
    except Exception:
        pass
    pipe.apply_batch = orig
    pipe.replay_stream(feed, ck, max_files_per_trigger=1)
    assert_matches_oracle(table, events)
