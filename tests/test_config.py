"""Config-file credential resolution (sources/config.py) — the
reference's ``pybabe.cfg`` / ``~/.pybabe.cfg`` seam
(pybabe/base.py:142-176), wired into pull_sql/push_sql, pull_twitter,
mail, and s3 session conf."""

import pytest
from pyspark.sql import functions as F

from pybabe_spark.sources import config as cfg_mod
from pybabe_spark.sources.config import (
    get_config,
    get_config_with_env,
    has_config,
    jdbc_section,
    resolve_sql_credentials,
    s3_spark_conf,
)


@pytest.fixture
def temp_cfg(tmp_path, monkeypatch):
    """Point the resolver at a writable temp cfg; restore after."""
    path = tmp_path / "pybabe.cfg"

    def write(text):
        path.write_text(text)
        cfg_mod.reset_config_cache()

    monkeypatch.setattr(cfg_mod, "CONFIG_PATHS", [str(path)])
    cfg_mod.reset_config_cache()
    yield write
    cfg_mod.reset_config_cache()


def test_precedence_kwargs_file_default(temp_cfg):
    temp_cfg("[smtp]\nserver = mail.example.com\n")
    # kwargs win over file
    assert (
        get_config("smtp", "server", {"server": "kw.example.com"})
        == "kw.example.com"
    )
    # file wins over default
    assert get_config("smtp", "server", default="d") == "mail.example.com"
    # default when absent
    assert get_config("smtp", "port", default="25") == "25"
    # absent + required raises naming section/key
    with pytest.raises(KeyError, match=r"port.*smtp"):
        get_config("smtp", "port", required=True)
    assert has_config("smtp", "server") and not has_config("smtp", "port")


def test_env_fallback_between_file_and_default(temp_cfg, monkeypatch):
    temp_cfg("[s3]\nAWS_ACCESS_KEY_ID = from-file\n")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "from-env")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "env-secret")
    # file beats env (reference order: kwargs, file, env, default)
    assert get_config_with_env("s3", "AWS_ACCESS_KEY_ID") == "from-file"
    # env fills what the file lacks
    assert get_config_with_env("s3", "AWS_SECRET_ACCESS_KEY") == "env-secret"
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY")
    assert get_config_with_env("s3", "AWS_SECRET_ACCESS_KEY", default="d") == "d"
    with pytest.raises(KeyError, match="environment"):
        get_config_with_env("s3", "AWS_SECRET_ACCESS_KEY", required=True)


def test_later_file_overrides_earlier(tmp_path, monkeypatch):
    a = tmp_path / "a.cfg"
    b = tmp_path / "b.cfg"
    a.write_text("[sql]\nuser = pkg-default\npassword = pkg-pw\n")
    b.write_text("[sql]\nuser = home-override\n")
    monkeypatch.setattr(cfg_mod, "CONFIG_PATHS", [str(a), str(b)])
    cfg_mod.reset_config_cache()
    try:
        assert get_config("sql", "user") == "home-override"
        assert get_config("sql", "password") == "pkg-pw"
    finally:
        cfg_mod.reset_config_cache()


def test_jdbc_section_and_sql_fallback(temp_cfg):
    assert jdbc_section("jdbc:mysql://h/db") == "mysql"
    assert jdbc_section("jdbc:derby:/tmp/db") == "derby"
    assert jdbc_section("not-a-jdbc-url") == "sql"
    temp_cfg(
        "[mysql]\nuser = mysql-u\npassword = mysql-p\n"
        "[sql]\nuser = generic-u\npassword = generic-p\n"
    )
    # subprotocol section wins
    assert resolve_sql_credentials("jdbc:mysql://h/db", None, None) == (
        "mysql-u",
        "mysql-p",
    )
    # unknown subprotocol falls back to [sql]
    assert resolve_sql_credentials("jdbc:postgresql://h/db", None, None) == (
        "generic-u",
        "generic-p",
    )
    # explicit args always win
    assert resolve_sql_credentials("jdbc:mysql://h/db", "me", "pw") == (
        "me",
        "pw",
    )


def test_s3_spark_conf_mapping(temp_cfg, monkeypatch):
    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    temp_cfg("")
    assert s3_spark_conf() == {}  # unconfigured → native IAM resolution
    temp_cfg(
        "[s3]\nAWS_ACCESS_KEY_ID = AK\nAWS_SECRET_ACCESS_KEY = SK\n"
        "AWS_ENDPOINT_URL = https://minio.local\n"
    )
    assert s3_spark_conf() == {
        "spark.hadoop.fs.s3a.access.key": "AK",
        "spark.hadoop.fs.s3a.secret.key": "SK",
        "spark.hadoop.fs.s3a.endpoint": "https://minio.local",
    }


def test_derby_roundtrip_reads_credentials_from_cfg(spark, tmp_path, temp_cfg):
    """End-to-end proof the cfg credentials actually reach the JDBC
    connection: embedded Derby scopes the DEFAULT SCHEMA to the
    connected user, so a push_sql/pull_sql pair that only works when
    both hit the same user-schema demonstrates the [derby] section
    flowed through (a different explicit user can't see the table)."""
    from pybabe_spark.sources.sql import pull_sql, push_sql

    temp_cfg("[derby]\nuser = alice\npassword = whatever\n")
    url = f"jdbc:derby:{tmp_path}/cfgdb;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(20).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 3).alias("v")
    )
    push_sql(df, url, "tcfg", mode="overwrite", **opts)  # no user kwarg
    back = pull_sql(spark, url, table="tcfg", **opts)  # no user kwarg
    assert back.count() == 20
    assert {r["k"]: r["v"] for r in back.collect()}[4] == 12
    # a DIFFERENT explicit user lands in another schema → table invisible,
    # proving the earlier calls really connected as alice from the cfg
    with pytest.raises(Exception, match="(?i)tcfg|not exist|schema"):
        pull_sql(spark, url, table="tcfg", user="bob", password="x", **opts)


def test_pull_twitter_token_from_cfg(spark, tmp_path, temp_cfg, monkeypatch):
    """bearer_token resolves from [twitter] in the cfg when the caller
    passes none — asserted through the injected transport's headers."""
    import pybabe_spark.sources.io as io_mod
    from pybabe_spark.sources.connectors import pull_twitter

    temp_cfg("[twitter]\nbearer_token = cfg-token-123\n")
    payload = tmp_path / "tweets.json"
    payload.write_text('{"data": [{"id": "1", "text": "hi"}]}')
    seen = {}

    def opener(url, timeout=None, headers=None):
        seen["headers"] = headers or {}
        return open(payload, "rb")

    monkeypatch.setattr(io_mod, "URL_OPENER", opener)
    out = pull_twitter(spark, "spark")
    assert out.count() == 1
    assert seen["headers"].get("Authorization") == "Bearer cfg-token-123"


def test_mail_smtp_settings_from_cfg(spark, temp_cfg):
    """mail() pulls server/port/author from [smtp] when not passed —
    observable via the injected transport's From header (the reference
    reads the same keys, pybabe/mail.py:24-29)."""
    from pybabe_spark.operators.infra import mail

    temp_cfg("[smtp]\nserver = smtp.example.com\nport = 2525\n"
             "author = reports@example.com\n")
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    sent = []
    mail(df, "subj", ["to@example.com"], transport=sent.append)
    assert len(sent) == 1
    assert sent[0]["From"] == "reports@example.com"
