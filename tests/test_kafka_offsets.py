"""Kafka work-unit planning vs a file-backed broker stub
(KafkaSource.java:198,498,577-650 semantics, no broker needed)."""

import pytest
from pyspark.sql import functions as F

from gobblin_spark.sources import kafka_offsets as K


@pytest.fixture()
def messages(spark):
    # two topics x two partitions, offsets contiguous from 0
    rows = [("tA", p, o, f"m-{p}-{o}") for p in (0, 1) for o in range(100)]
    rows += [("tB", 0, o, f"b-{o}") for o in range(40, 60)]  # truncated head
    return spark.createDataFrame(
        rows, "topic string, partition int, offset long, value string")


def test_stub_offset_contract(messages):
    stub = K.FileBackedKafkaStub(messages)
    assert stub.get_topics() == {"tA": [0, 1], "tB": [0]}
    tp = K.TopicPartition("tB", 0)
    assert stub.get_earliest_offsets([tp])[tp] == 40
    assert stub.get_latest_offsets([tp])[tp] == 60  # next offset, max+1


def test_bootstrap_modes(messages):
    stub = K.FileBackedKafkaStub(messages)
    by_tp = lambda us: {(u.topic, u.partition): u for u in us}

    latest = by_tp(K.plan_work_units(stub, bootstrap_with_offset=K.LATEST))
    assert latest[("tA", 0)].start_offset == 100 and latest[("tA", 0)].empty

    earliest = by_tp(K.plan_work_units(stub, bootstrap_with_offset=K.EARLIEST))
    assert earliest[("tA", 0)].start_offset == 0
    assert earliest[("tB", 0)].start_offset == 40
    assert earliest[("tA", 0)].end_offset == 100

    look = by_tp(K.plan_work_units(
        stub, bootstrap_with_offset=K.LOOKBACK, offset_lookback=10))
    assert look[("tA", 1)].start_offset == 90
    # lookback below earliest on tB (60-10=50 >= 40: in range)
    assert look[("tB", 0)].start_offset == 50

    # lookback far out of range resolves via reset policy (nearest→earliest)
    deep = by_tp(K.plan_work_units(
        stub, bootstrap_with_offset=K.LOOKBACK, offset_lookback=1000,
        reset_on_out_of_range=K.NEAREST))
    assert deep[("tB", 0)].start_offset == 40

    assert K.plan_work_units(stub, bootstrap_with_offset=K.SKIP) == []


def test_previous_offsets_and_out_of_range(messages):
    stub = K.FileBackedKafkaStub(messages)
    prev = {
        K.TopicPartition("tA", 0): 30,   # in range → resume
        K.TopicPartition("tA", 1): 500,  # beyond latest → nearest = latest
        K.TopicPartition("tB", 0): 10,   # below earliest (retention) → earliest
    }
    units = {(u.topic, u.partition): u
             for u in K.plan_work_units(stub, previous_offsets=prev)}
    assert units[("tA", 0)].start_offset == 30
    assert units[("tA", 1)].start_offset == 100 and units[("tA", 1)].empty
    assert units[("tB", 0)].start_offset == 40

    # reset=skip: out-of-range partition persists prev via an empty unit
    skipped = {(u.topic, u.partition): u for u in K.plan_work_units(
        stub, previous_offsets=prev, reset_on_out_of_range=K.SKIP)}
    assert skipped[("tB", 0)].start_offset == 10 and skipped[("tB", 0)].empty


def test_offset_fetch_failure_preserves_watermark(messages):
    stub = K.FileBackedKafkaStub(messages)
    gone = K.TopicPartition("tGone", 0)
    prev = {gone: 77}

    class FlakyStub:
        def get_topics(self):
            return {**stub.get_topics(), "tGone": [0]}

        def get_earliest_offsets(self, parts):
            return stub.get_earliest_offsets(parts)  # tGone missing

        def get_latest_offsets(self, parts):
            return stub.get_latest_offsets(parts)

    units = {(u.topic, u.partition): u for u in K.plan_work_units(
        FlakyStub(), previous_offsets=prev, bootstrap_with_offset=K.EARLIEST)}
    assert units[("tGone", 0)].start_offset == 77 and units[("tGone", 0)].empty


def test_topic_filtering():
    topics = ["events_a", "events_b", "logs", "tmp_x"]
    assert K.filter_topics(topics, whitelist=["events_.*"]) == \
        ["events_a", "events_b"]
    assert K.filter_topics(topics, blacklist=["tmp_.*"]) == \
        ["events_a", "events_b", "logs"]


def test_offsets_json_handoff(messages):
    stub = K.FileBackedKafkaStub(messages)
    units = K.plan_work_units(stub, bootstrap_with_offset=K.EARLIEST)
    start, end = K.offsets_json(units)
    import json

    s, e = json.loads(start), json.loads(end)
    assert s["tA"] == {"0": 0, "1": 0} and e["tA"] == {"0": 100, "1": 100}
    assert s["tB"] == {"0": 40} and e["tB"] == {"0": 60}


def test_read_intervals_incremental_pull(spark, messages):
    stub = K.FileBackedKafkaStub(messages)
    prev = {K.TopicPartition("tA", 0): 90, K.TopicPartition("tA", 1): 95}
    units = K.plan_work_units(stub, previous_offsets=prev,
                              bootstrap_with_offset=K.EARLIEST)
    out = K.read_intervals(messages, units)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # manifest broadcast, stream unshuffled
    got = {(r.topic, r.partition): r.n for r in
           out.groupBy("topic", "partition").agg(F.count("*").alias("n")).collect()}
    assert got == {("tA", 0): 10, ("tA", 1): 5, ("tB", 0): 20}
    # drained: replanning from the new latest yields empty units only
    done = {K.TopicPartition(u.topic, u.partition): u.end_offset for u in units}
    units2 = K.plan_work_units(stub, previous_offsets=done)
    assert all(u.empty for u in units2)


def test_offsets_json_connector_parity(spark, messages):
    """The broker path is wired even though no broker runs here: the
    intervals read_intervals() executes must equal what Spark's real
    Kafka batch source would return for the same plan, i.e. rows with
    startingOffsets <= offset < endingOffsets per topic-partition
    (the [start, end) contract of the connector's offset JSON —
    KafkaSource.java:577-650 plans, streaming/runner.py hands off)."""
    import json

    stub = K.FileBackedKafkaStub(messages)
    prev = {K.TopicPartition("tA", 0): 90, K.TopicPartition("tB", 0): 45}
    units = K.plan_work_units(stub, previous_offsets=prev,
                              bootstrap_with_offset=K.EARLIEST)
    start_json, end_json = K.offsets_json(units)
    start, end = json.loads(start_json), json.loads(end_json)

    # connector-semantics reference: filter by the JSON intervals
    rows = messages.collect()
    expect = sorted(
        (r.topic, r.partition, r.offset) for r in rows
        if str(r.partition) in start.get(r.topic, {})
        and start[r.topic][str(r.partition)] <= r.offset
        < end[r.topic][str(r.partition)]
    )
    got = sorted(
        (r.topic, r.partition, r.offset)
        for r in K.read_intervals(messages, units).collect()
    )
    assert got == expect and len(got) > 0
    # every planned unit appears in both encodings with identical bounds
    for u in units:
        assert start[u.topic][str(u.partition)] == u.start_offset
        assert end[u.topic][str(u.partition)] == u.end_offset
