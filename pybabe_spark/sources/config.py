"""Config-file credential resolution — the reference's ``pybabe.cfg`` /
``~/.pybabe.cfg`` seam (pybabe/base.py:142-176 ``get_config_object`` /
``get_config`` / ``get_config_with_env`` / ``has_config``).

Resolution order is the reference's exactly:

1. an explicit kwarg (callers always win),
2. the config file(s) — a package-adjacent ``pybabe.cfg`` then
   ``~/.pybabe.cfg`` (later files override earlier ones, stock
   ConfigParser semantics),
3. (``get_config_with_env`` only) an environment variable named
   exactly like the key — the reference's s3/kontagent pattern uses
   env-style key names (``AWS_ACCESS_KEY_ID``) so the same key reads
   both surfaces,
4. the ``default``; if that is None the key is REQUIRED and a
   ``KeyError`` is raised naming the section/key, like the
   reference's ``Exception``.

Driver-side pure Python — nothing here touches Spark. Consumers:
``pull_sql``/``push_sql`` (section per JDBC subprotocol, ``[sql]``
fallback), ``pull_twitter`` (``[twitter] bearer_token``), ``mail``
(``[smtp]``), and :func:`s3_spark_conf` which turns ``[s3]``
credentials into the ``spark.hadoop.fs.s3a.*`` entries a session
builder needs (reference pybabe/protocol_s3.py:9-13).

``CONFIG_PATHS`` is module state so tests (and embedders) can point
the resolver at a temp file; call :func:`reset_config_cache` after
changing it or the file contents.
"""

from __future__ import annotations

import os
from typing import Mapping

#: Files read, in order — later files override earlier ones. Mirrors
#: the reference's [package_dir/pybabe.cfg, ~/.pybabe.cfg] pair.
CONFIG_PATHS: list[str] = [
    os.path.join(os.path.dirname(__file__), "pybabe.cfg"),
    os.path.expanduser("~/.pybabe.cfg"),
]

_CONFIG_CACHE = None


def reset_config_cache() -> None:
    """Drop the parsed-config cache (after editing CONFIG_PATHS or the
    underlying files — the reference caches forever; we expose the
    reset explicitly instead)."""
    global _CONFIG_CACHE
    _CONFIG_CACHE = None


def get_config_object():
    """The parsed ConfigParser over ``CONFIG_PATHS`` (cached; missing
    files are skipped, stock ``ConfigParser.read`` list behavior)."""
    global _CONFIG_CACHE
    if _CONFIG_CACHE is None:
        import configparser

        cfg = configparser.ConfigParser()
        cfg.read(CONFIG_PATHS)
        _CONFIG_CACHE = cfg
    return _CONFIG_CACHE


def has_config(section: str, key: str) -> bool:
    return get_config_object().has_option(section, key)


def get_config(
    section: str,
    key: str,
    kwargs: Mapping | None = None,
    default=None,
    required: bool = False,
):
    """kwargs → config file → default. ``required=True`` (or, like the
    reference, any call whose default is None when the value is
    genuinely needed) raises ``KeyError`` naming the miss."""
    if kwargs and key in kwargs and kwargs[key] is not None:
        return kwargs[key]
    cfg = get_config_object()
    if cfg.has_option(section, key):
        return cfg.get(section, key)
    if default is not None or not required:
        return default
    raise KeyError(
        f"unable to locate key {key!r} from section [{section}] in "
        f"kwargs or config files {CONFIG_PATHS}"
    )


def get_config_with_env(
    section: str,
    key: str,
    kwargs: Mapping | None = None,
    default=None,
    required: bool = False,
):
    """kwargs → config file → env var named exactly ``key`` → default
    (reference pybabe/base.py:161-170)."""
    if kwargs and key in kwargs and kwargs[key] is not None:
        return kwargs[key]
    if has_config(section, key):
        return get_config_object().get(section, key)
    env = os.getenv(key)
    if env is not None:
        return env
    if default is not None or not required:
        return default
    raise KeyError(
        f"unable to locate key {key!r} from section [{section}] in "
        f"kwargs, config files {CONFIG_PATHS}, or the environment"
    )


def jdbc_section(url: str) -> str:
    """Config section for a JDBC url: the subprotocol (``jdbc:mysql:…``
    → ``mysql``), so one file can hold per-database credentials the way
    the reference's PULL_DB kwargs did (pybabe/sql.py:14-110)."""
    parts = url.split(":", 2)
    if len(parts) >= 2 and parts[0] == "jdbc" and parts[1]:
        return parts[1]
    return "sql"


def resolve_sql_credentials(
    url: str, user: str | None, password: str | None
) -> tuple[str | None, str | None]:
    """Fill missing JDBC credentials from the config file: the
    subprotocol section first (``[mysql] user=…``), then the generic
    ``[sql]`` section. Explicit arguments always win; absent
    everywhere stays None (credential-less databases — Derby, SQLite —
    are legitimate)."""
    section = jdbc_section(url)
    if user is None:
        user = get_config(section, "user", default=None) or get_config(
            "sql", "user", default=None
        )
    if password is None:
        password = get_config(
            section, "password", default=None
        ) or get_config("sql", "password", default=None)
    return user, password


def s3_spark_conf(kwargs: Mapping | None = None) -> dict[str, str]:
    """``[s3]`` credentials (env fallback, reference key names
    AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY — protocol_s3.py:9-13)
    as the ``spark.hadoop.fs.s3a.*`` settings to hand a
    ``SparkSession.builder`` before the session starts. Empty dict
    when unconfigured — native IAM/instance-profile resolution is the
    100 TB default; the file seam exists for the reference's
    explicit-keys workflow."""
    key_id = get_config_with_env(
        "s3", "AWS_ACCESS_KEY_ID", kwargs, default=None
    )
    secret = get_config_with_env(
        "s3", "AWS_SECRET_ACCESS_KEY", kwargs, default=None
    )
    out: dict[str, str] = {}
    if key_id:
        out["spark.hadoop.fs.s3a.access.key"] = str(key_id)
    if secret:
        out["spark.hadoop.fs.s3a.secret.key"] = str(secret)
    endpoint = get_config_with_env(
        "s3", "AWS_ENDPOINT_URL", kwargs, default=None
    )
    if endpoint:
        out["spark.hadoop.fs.s3a.endpoint"] = str(endpoint)
    return out
