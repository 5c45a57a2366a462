"""Config store: hierarchical resolution, tag imports, cycle safety,
FS-layout loading, and policy grouping driving a retention run
(SimpleHadoopFilesystemConfigStore / ConfigClient semantics)."""

from gobblin_spark.plans import config_store as CS


def build_store() -> CS.ConfigStore:
    s = CS.ConfigStore()
    s.put("/", {"retention.policy": "none", "owner": "data-platform"})
    s.put("/tags/hot", {"retention.policy": "newest_k", "retention.k": "3"})
    s.put("/tags/cold", {"retention.policy": "time", "retention.days": "365"})
    s.put("/data/tracking", {"owner": "tracking-team"})
    s.put("/data/tracking/events", {}, imports=["/tags/hot"])
    s.put("/data/archive/logs", {"retention.days": "30"}, imports=["/tags/cold"])
    return s


def test_ancestor_inheritance_and_own_wins():
    s = build_store()
    r = s.resolve("/data/tracking/events")
    assert r["owner"] == "tracking-team"  # parent beats root
    assert r["retention.policy"] == "newest_k"  # import beats ancestors
    assert r["retention.k"] == "3"


def test_own_keys_beat_imports():
    s = build_store()
    r = s.resolve("/data/archive/logs")
    assert r["retention.policy"] == "time"  # from import
    assert r["retention.days"] == "30"  # own key overrides the tag's 365


def test_unconfigured_path_inherits_ancestors():
    s = build_store()
    r = s.resolve("/data/tracking/events/2024/01/01")
    assert r["retention.policy"] == "newest_k" and r["owner"] == "tracking-team"


def test_import_order_nearest_wins_and_cycles_cut():
    s = CS.ConfigStore()
    s.put("/a", {"k": "a"}, imports=["/b"])
    s.put("/b", {"k": "b", "only_b": "1"}, imports=["/a"])  # cycle
    s.put("/n", {}, imports=["/a", "/b"])
    r = s.resolve("/n")
    assert r["k"] == "a"  # earlier-listed import wins
    assert r["only_b"] == "1"
    assert s.resolve("/a")["k"] == "a"  # cycle doesn't recurse forever


def test_fs_layout_loading(tmp_path):
    (tmp_path / "tags" / "hot").mkdir(parents=True)
    (tmp_path / "data" / "events").mkdir(parents=True)
    (tmp_path / "main.conf").write_text("owner=root\n")
    (tmp_path / "tags" / "hot" / "main.conf").write_text("retention.k=5\n")
    (tmp_path / "data" / "events" / "includes.conf").write_text("/tags/hot\n")
    (tmp_path / "data" / "events" / "main.conf").write_text("fmt=parquet\n")
    s = CS.load_config_store(str(tmp_path))
    r = s.resolve("/data/events")
    assert r == {"owner": "root", "retention.k": "5", "fmt": "parquet"}


def test_group_by_policy_plans_one_job_per_group():
    s = build_store()
    datasets = [
        "/data/tracking/events/t1",
        "/data/tracking/events/t2",
        "/data/archive/logs/app1",
    ]
    groups = s.group_by_policy(datasets, ["retention.policy", "retention.k"])
    assert groups[("newest_k", "3")] == [
        "/data/tracking/events/t1",
        "/data/tracking/events/t2",
    ]
    assert ("time", None) in groups


def test_policy_group_drives_retention(spark):
    """Resolved config → an actual retention run: keep newest-k
    versions per key, k taken from the config store."""
    from pyspark.sql import functions as F

    from gobblin_spark.operators import retention as R

    s = build_store()
    k = int(s.resolve("/data/tracking/events")["retention.k"])
    df = spark.range(50).select(
        (F.col("id") % 5).alias("key"), F.col("id").alias("version")
    )
    deletable = R.newest_k_deletable(df, ["key"], ["version"], k)
    assert deletable.count() == 50 - 5 * k
    assert deletable.groupBy("key").count().filter(f"count != {10 - k}").count() == 0
