"""Configuration loader (ref /root/reference/src/config.rs).

TOML shape (ref config.rs:8-36):

    [storage.r2]
    endpoint = "…"  bucket = "…"  access_key_id = "…"
    secret_access_key = "…"  region = "…"  path = "…"

    [defaults]
    algorithms = ["sha256", …]
    output = "…"

Precedence: explicit arg > env var > ./.shaha.toml > ~/.config/shaha/
config.toml (ref config.rs:97-144, README.md:106-110). Object-store
credentials map onto ``spark.hadoop.fs.s3a.*`` so the same build/query
code runs against s3a:// URIs — this replaces the reference's entire
embedded-DuckDB remote backend (ref src/storage/r2.rs).
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

ENV_PREFIX = "SHAHA_"


@dataclass
class R2Config:
    endpoint: str | None = None
    bucket: str | None = None
    access_key_id: str | None = None
    secret_access_key: str | None = None
    region: str | None = None
    path: str | None = None


@dataclass
class Config:
    r2: R2Config = field(default_factory=R2Config)
    algorithms: list[str] = field(default_factory=lambda: ["sha256"])
    output: str | None = None


def _load_toml(path: str) -> dict[str, Any]:
    try:
        with open(path, "rb") as fh:
            return tomllib.load(fh)
    except FileNotFoundError:
        return {}


def _merge(base: dict[str, Any], overlay: dict[str, Any]) -> dict[str, Any]:
    out = dict(base)
    for key, value in overlay.items():
        if isinstance(value, dict) and isinstance(out.get(key), dict):
            out[key] = _merge(out[key], value)
        else:
            out[key] = value
    return out


def load_config(
    cwd: str | None = None,
    home_config: str | None = None,
    env: dict[str, str] | None = None,
) -> Config:
    env = env if env is not None else dict(os.environ)
    home_path = home_config or os.path.expanduser("~/.config/shaha/config.toml")
    local_path = os.path.join(cwd or os.getcwd(), ".shaha.toml")
    # lowest precedence first
    data = _merge(_load_toml(home_path), _load_toml(local_path))

    r2_data = (data.get("storage") or {}).get("r2") or {}
    defaults = data.get("defaults") or {}

    def env_or(key: str, current: Any) -> Any:
        return env.get(ENV_PREFIX + key.upper(), current)

    r2 = R2Config(
        endpoint=env_or("r2_endpoint", r2_data.get("endpoint")),
        bucket=env_or("r2_bucket", r2_data.get("bucket")),
        access_key_id=env_or("r2_access_key_id", r2_data.get("access_key_id")),
        secret_access_key=env_or("r2_secret_access_key", r2_data.get("secret_access_key")),
        region=env_or("r2_region", r2_data.get("region")),
        path=env_or("r2_path", r2_data.get("path")),
    )
    algorithms = defaults.get("algorithms", ["sha256"])
    env_algos = env.get(ENV_PREFIX + "ALGORITHMS")
    if env_algos:
        algorithms = [a.strip() for a in env_algos.split(",") if a.strip()]
    return Config(r2=r2, algorithms=algorithms, output=env_or("output", defaults.get("output")))


#: Committer + transfer settings a 1000-executor job needs on an object
#: store. Rename on S3 is a COPY+DELETE per file — the default
#: FileOutputCommitter v1 renames every task's output twice, turning a
#: 100 TB write's commit into hours of driver-serialized copies and a
#: window where failures leave partial output. The MAGIC committer
#:(hadoop-aws ≥3.1) writes each task's data as an incomplete multipart
#: upload and completes the uploads at job commit: zero renames, atomic
#: per-file visibility (the same property the reference relies on from
#: its single-writer R2 PUT, ref src/storage/r2.rs:161-232). Retry and
#: connection-pool limits sized for transient 503s at fleet scale.
S3A_SCALE_SETTINGS: dict[str, str] = {
    "fs.s3a.committer.name": "magic",
    "fs.s3a.committer.magic.enabled": "true",
    "fs.s3a.connection.maximum": "96",
    "fs.s3a.attempts.maximum": "5",
    "fs.s3a.retry.limit": "7",
    "fs.s3a.retry.throttle.limit": "20",
    "fs.s3a.fast.upload": "true",
    "fs.s3a.fast.upload.buffer": "disk",
    "fs.s3a.multipart.size": "128M",
    "fs.s3a.threads.max": "64",
    # directory-marker retention avoids a DELETE storm per directory
    "fs.s3a.directory.marker.retention": "keep",
}

#: Spark-side halves of the committer binding (runtime SQL confs).
S3A_COMMITTER_SQL_CONF: dict[str, str] = {
    "spark.sql.sources.commitProtocolClass":
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class":
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
}


def apply_object_store(spark: SparkSession, cfg: Config) -> None:
    """Map credentials to s3a settings (replaces ref src/storage/r2.rs:74-111).

    When an object store is actually configured, also pins the magic
    committer + retry/upload tuning (S3A_SCALE_SETTINGS) so the parquet
    write path is rename-free at any scale.
    """
    hconf = spark._jsc.hadoopConfiguration()
    if cfg.r2.endpoint:
        hconf.set("fs.s3a.endpoint", cfg.r2.endpoint)
        hconf.set("fs.s3a.path.style.access", "true")
    if cfg.r2.access_key_id:
        hconf.set("fs.s3a.access.key", cfg.r2.access_key_id)
    if cfg.r2.secret_access_key:
        hconf.set("fs.s3a.secret.key", cfg.r2.secret_access_key)
    if cfg.r2.region:
        hconf.set("fs.s3a.endpoint.region", cfg.r2.region)
    if cfg.r2.endpoint or cfg.r2.bucket:
        for key, value in S3A_SCALE_SETTINGS.items():
            hconf.set(key, value)
        if cloud_committer_available(spark):
            for key, value in S3A_COMMITTER_SQL_CONF.items():
                spark.conf.set(key, value)


def cloud_committer_available(spark: SparkSession) -> bool:
    """True when spark-hadoop-cloud's PathOutputCommitProtocol is on the
    classpath. Binding the SQL committer confs without it would fail
    EVERY parquet write (local ones included) with ClassNotFound, so
    apply_object_store only binds when the class resolves; the hadoop
    fs.s3a.* half is always safe (consulted only by the S3A filesystem).
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        )
        return True
    except Exception:
        return False


def r2_uri(cfg: Config, suffix: str = "") -> str:
    """s3a:// URI for the configured bucket/path (ref r2.rs URL building)."""
    if not cfg.r2.bucket:
        raise ValueError("r2 bucket not configured")
    base = f"s3a://{cfg.r2.bucket}"
    if cfg.r2.path:
        base = f"{base}/{cfg.r2.path.strip('/')}"
    if suffix:
        base = f"{base}/{suffix.lstrip('/')}"
    return base
