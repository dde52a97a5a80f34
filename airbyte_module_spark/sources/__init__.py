from airbyte_module_spark.sources.feed import parse_envelopes, read_feed, read_feed_stream
from airbyte_module_spark.sources.generator import FeedSpec, generate_feed, generate_feed_spark

__all__ = [
    "FeedSpec",
    "generate_feed",
    "generate_feed_spark",
    "parse_envelopes",
    "read_feed",
    "read_feed_stream",
]
