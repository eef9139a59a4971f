"""Sink semantics (append / empty guard / DDL collision) and the
NDJSON + nested-schema sources."""

from __future__ import annotations

import os
import tempfile

from twitter_etl_spark.sinks import (
    TWEET_DATA_SCHEMA,
    append_table,
    create_table_if_absent,
)
from twitter_etl_spark.sources import (
    TWEET_STREAM_SCHEMA,
    read_ndjson,
)


def test_append_and_empty_guard(spark):
    d = os.path.join(tempfile.mkdtemp(), "t")
    df = spark.range(3).toDF("id")
    assert append_table(df, d) is True
    assert append_table(df.filter("id < 0"), d) is False  # empty -> no write
    assert append_table(None, d) is False  # NULL guard (main.R:114)
    assert append_table(df, d) is True
    assert spark.read.parquet(d).count() == 6  # at-least-once append


def test_ddl_create_if_absent_collision(spark):
    base = os.path.join(tempfile.mkdtemp(), "tbl")
    p1 = create_table_if_absent(spark, base)
    assert p1 == base
    assert spark.read.parquet(p1).schema == TWEET_DATA_SCHEMA
    p2 = create_table_if_absent(spark, base)  # collision -> fresh name
    assert p2 != base and p2.startswith(base)
    assert os.path.exists(base)  # original untouched


def test_nested_tweet_schema_roundtrip(spark):
    import json

    d = tempfile.mkdtemp()
    payload = {
        "id_str": "1",
        "created_at": "Mon Jan 01 00:00:00 +0000 2024",
        "text": "hola @x http://t.co/y",
        "lang": "es",
        "source": "web",
        "user": {"screen_name": "alice", "location": "scl"},
        "entities": {"hashtags": [{"text": "chile"}]},
        "quoted_status": {"text": "q", "user": {"screen_name": "bob"}},
        "extra_props": "{\"k\": 1}",
    }
    with open(os.path.join(d, "stream_20240101_000000.json"), "w") as f:
        f.write(json.dumps(payload) + "\n")
    df = read_ndjson(spark, d, TWEET_STREAM_SCHEMA)
    row = df.first()
    # nested flatten via dotted select — the rtweet parse_stream
    # equivalent (main.R:81)
    flat = df.select(
        "user.screen_name", "quoted_status.user.screen_name", "entities.hashtags"
    ).first()
    assert row["lang"] == "es"
    assert flat[0] == "alice" and flat[1] == "bob"
    assert flat[2][0]["text"] == "chile"
