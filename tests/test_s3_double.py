"""s3-protocol contract double — the reference's glob matching
(pybabe/protocol_s3.py:34-50) and etag download cache
(protocol_s3.py:89-111, filecache.py), exercised locally:

* glob semantics ride Hadoop-FS natively, so ``file://`` URIs with
  ``*`` / ``?`` patterns through ``pull`` prove the exact path an
  ``s3a://bucket/key*.csv`` takes on a cluster (same FileSystem glob
  API, different scheme);
* the etag cache is driven through injected URL_STAT/URL_OPENER seams
  (the mongo-double approach): hit → zero network calls, changed etag
  → re-download, unknown etag → bypass.
"""

import gzip
import os

import pytest

import pybabe_spark.sources.io as io_mod
from pybabe_spark.sources.filecache import FileCache
from pybabe_spark.sources.io import pull


# ---------------------------------------------------------------------------
# Hadoop-FS glob semantics through pull (file:// stands in for s3a://)
# ---------------------------------------------------------------------------

def _write_parts(tmp_path):
    (tmp_path / "part-0.csv").write_text("k,v\n1,a\n2,b\n")
    (tmp_path / "part-1.csv").write_text("k,v\n3,c\n")
    (tmp_path / "part-10.csv").write_text("k,v\n4,d\n")
    (tmp_path / "other.txt").write_text("noise\n")


def test_pull_glob_star_over_hadoop_fs(spark, tmp_path):
    _write_parts(tmp_path)
    df = pull(spark, f"file://{tmp_path}/part-*.csv")
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3, 4]
    assert df.columns == ["k", "v"]


def test_pull_glob_question_mark_single_char(spark, tmp_path):
    _write_parts(tmp_path)
    # '?' matches exactly one character: part-0/part-1 but NOT part-10
    df = pull(spark, f"file://{tmp_path}/part-?.csv")
    assert sorted(r["k"] for r in df.collect()) == [1, 2, 3]


def test_pull_glob_no_match_fails_like_fail_on_empty(spark, tmp_path):
    _write_parts(tmp_path)
    # reference raised "No key matching pattern" (protocol_s3.py:39-40);
    # Spark's scan raises its path-not-found analysis error
    with pytest.raises(Exception, match="(?i)path|exist|match"):
        pull(spark, f"file://{tmp_path}/nope-*.csv").collect()


def test_pull_glob_compressed_members(spark, tmp_path):
    # glob + .gz together — the s3 workflow the reference served
    # (compressed log shards under one prefix)
    for i, row in enumerate(["1,x", "2,y"]):
        with gzip.open(tmp_path / f"log-{i}.csv.gz", "wt") as f:
            f.write(f"k,v\n{row}\n")
    df = pull(spark, f"file://{tmp_path}/log-*.csv.gz")
    assert sorted(r["k"] for r in df.collect()) == [1, 2]


# ---------------------------------------------------------------------------
# FileCache unit contract (reference filecache.py semantics, fixed)
# ---------------------------------------------------------------------------

def test_filecache_lookup_fetches_once(tmp_path):
    fc = FileCache(str(tmp_path / "cache"))
    calls = []

    def fetch(tmp):
        calls.append(tmp)
        with open(tmp, "w") as f:
            f.write("payload")

    p1 = fc.lookup("obj-etag1", fetch)
    p2 = fc.lookup("obj-etag1", fetch)
    assert p1 == p2 and open(p1).read() == "payload"
    assert len(calls) == 1  # second lookup was a pure cache hit
    # a different etag is a different cache entry
    fc.lookup("obj-etag2", fetch)
    assert len(calls) == 2


def test_filecache_failed_fetch_leaves_no_entry(tmp_path):
    fc = FileCache(str(tmp_path / "cache"))

    def boom(tmp):
        with open(tmp, "w") as f:
            f.write("partial")
        raise IOError("network died")

    with pytest.raises(IOError):
        fc.lookup("obj-etag", boom)
    assert not fc.has("obj-etag")
    # the partial temp was cleaned up too — nothing is left behind
    assert os.listdir(fc.cache_dir) == []


def test_filecache_cleanup_trims_oldest_first(tmp_path):
    fc = FileCache(str(tmp_path / "cache"), size_limit=25)
    names = ["a-e1", "b-e1", "c-e1"]
    for i, n in enumerate(names):
        p = fc.lookup(n, lambda t: open(t, "w").write("0123456789"))
        os.utime(p, (1000 + i, 1000 + i))  # deterministic age order
    # 30 bytes > 25 limit → oldest (a-e1) evicted, newer two survive
    fc.cleanup()
    assert not fc.has("a-e1") and fc.has("b-e1") and fc.has("c-e1")


def test_filecache_cleanup_sweeps_tmp_debris(tmp_path):
    from pybabe_spark.sources.filecache import TMP_SUFFIX

    fc = FileCache(str(tmp_path / "cache"))
    debris = os.path.join(fc.cache_dir, "dead" + TMP_SUFFIX)
    open(debris, "w").write("x")
    fc.cleanup()
    assert not os.path.exists(debris)


# ---------------------------------------------------------------------------
# etag cache through pull — injected URL_STAT + counting opener
# ---------------------------------------------------------------------------

@pytest.fixture
def fake_remote(tmp_path, monkeypatch):
    """A fake remote object with a mutable etag + download counter."""
    state = {"etag": "v1", "body": "k,v\n1,a\n2,b\n", "downloads": 0}

    def opener(url, timeout=None, headers=None):
        state["downloads"] += 1
        import io as _io

        return _io.BytesIO(state["body"].encode())

    monkeypatch.setattr(io_mod, "URL_OPENER", opener)
    monkeypatch.setattr(io_mod, "URL_STAT", lambda url: state["etag"])
    state["cache_dir"] = str(tmp_path / "s3cache")
    return state


def test_pull_etag_cache_hit_skips_download(spark, fake_remote):
    url = "http://fake.example/data.csv"
    kw = dict(cache=True, cache_dir=fake_remote["cache_dir"])
    df1 = pull(spark, url, **kw)
    assert df1.count() == 2 and fake_remote["downloads"] == 1
    df2 = pull(spark, url, **kw)  # same etag → served from cache
    assert df2.count() == 2 and fake_remote["downloads"] == 1
    # remote object changed → new etag → exactly one more download
    fake_remote["etag"] = "v2"
    fake_remote["body"] = "k,v\n1,a\n2,b\n3,c\n"
    df3 = pull(spark, url, **kw)
    assert df3.count() == 3 and fake_remote["downloads"] == 2


def test_pull_unknown_etag_bypasses_cache(spark, fake_remote, monkeypatch):
    monkeypatch.setattr(io_mod, "URL_STAT", lambda url: None)
    url = "http://fake.example/data.csv"
    kw = dict(cache=True, cache_dir=fake_remote["cache_dir"])
    pull(spark, url, **kw).count()
    pull(spark, url, **kw).count()
    assert fake_remote["downloads"] == 2  # no validation → no caching
    assert not os.path.exists(fake_remote["cache_dir"]) or not os.listdir(
        fake_remote["cache_dir"]
    )


def test_pull_cache_defaults_off_and_config_enables(
    spark, fake_remote, tmp_path, monkeypatch
):
    """cache defaults OFF; the reference's ``[s3] cache`` config switch
    turns it on (protocol_s3.py:89-95)."""
    from pybabe_spark.sources import config as cfg_mod

    url = "http://fake.example/data.csv"
    pull(spark, url).count()
    pull(spark, url).count()
    assert fake_remote["downloads"] == 2  # off by default

    cfgfile = tmp_path / "pybabe.cfg"
    cfgfile.write_text(
        f"[s3]\ncache = true\ncache_dir = {fake_remote['cache_dir']}\n"
    )
    monkeypatch.setattr(cfg_mod, "CONFIG_PATHS", [str(cfgfile)])
    cfg_mod.reset_config_cache()
    try:
        pull(spark, url).count()
        pull(spark, url).count()
        assert fake_remote["downloads"] == 3  # one fill, one hit
    finally:
        cfg_mod.reset_config_cache()
