"""Unit tests for session conf layering (no SparkSession needed)."""

from flowbyte_spark import session as sess


def test_extra_conf_jars_merge_with_memcat(monkeypatch):
    """A caller's spark.jars must UNION with the memcat jar, not clobber
    it (ADVICE r6: the catalog conf key stayed set while the class became
    unloadable at first use)."""
    monkeypatch.setattr(
        sess,
        "_memcat_conf",
        lambda: {
            "spark.jars": "/x/flowbyte-memcat.jar",
            "spark.sql.catalog.memcat": "flowbyte.memcat.MemoryCatalog",
        },
    )
    conf = sess._build_conf({"spark.jars": "/y/user.jar,/z/other.jar"})
    jars = conf["spark.jars"].split(",")
    assert "/x/flowbyte-memcat.jar" in jars
    assert "/y/user.jar" in jars and "/z/other.jar" in jars
    assert len(jars) == len(set(jars))
    assert conf["spark.sql.catalog.memcat"] == "flowbyte.memcat.MemoryCatalog"


def test_extra_conf_jars_dedup(monkeypatch):
    monkeypatch.setattr(
        sess, "_memcat_conf", lambda: {"spark.jars": "/x/memcat.jar"}
    )
    conf = sess._build_conf({"spark.jars": "/x/memcat.jar"})
    assert conf["spark.jars"] == "/x/memcat.jar"


def test_no_jars_anywhere(monkeypatch):
    monkeypatch.setattr(sess, "_memcat_conf", lambda: {})
    conf = sess._build_conf(None)
    assert "spark.jars" not in conf


def test_caller_overrides_still_win_for_scalar_confs(monkeypatch):
    monkeypatch.setattr(sess, "_memcat_conf", lambda: {})
    conf = sess._build_conf({"spark.sql.shuffle.partitions": "7"})
    assert conf["spark.sql.shuffle.partitions"] == "7"
