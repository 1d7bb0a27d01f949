"""File sources: CSV (local/remote), JSON, Parquet — plus the remote
CSV seeding path.

Reference parity:
- remote CSV scan (S3, `/root/reference/pyopenetl/operations.py:486-513`):
  the reference streams ``pd.read_csv(url, chunksize=200_000)``. Spark
  cannot read arbitrary HTTPS urls natively, so we fetch to a local
  spool file (driver-side, streamed — constant memory) and hand the
  path to ``spark.read.csv``, which then scans in parallel (splittable).
  On a cluster you would land the file on shared storage instead; the
  API is identical.
- header + schema inference matches the reference's pandas defaults.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from python_openetl_spark.functions.normalize import normalize_timestamps


def read_csv(spark: SparkSession, path: str, *, header: bool = True, infer: bool = True) -> DataFrame:
    return (
        spark.read.option("header", header)
        .option("inferSchema", infer)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON scan; pass a DDL ``schema`` in production — JSON files
    carry no schema of their own, so schema inference both costs an
    extra pass over the data and returns NOTHING on an empty stage
    (a zero-row day would break downstream column references)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def fetch_to_local(url: str, dest_dir: str | None = None, *, chunk_bytes: int = 1 << 20) -> str:
    """Stream a remote file to a local spool path (constant memory —
    parity with the reference's streamed GET, `operations.py:645-652`).
    ``file://`` and plain paths pass through untouched."""
    if url.startswith("file://"):
        return url[len("file://"):]
    if "://" not in url:
        return url
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="openetl_fetch_")
    local = os.path.join(dest_dir, os.path.basename(url.split("?")[0]) or "download")
    with urllib.request.urlopen(url) as resp, open(local, "wb") as out:  # noqa: S310
        shutil.copyfileobj(resp, out, length=chunk_bytes)
    return local


def seed_from_remote_csv(
    spark: SparkSession,
    url: str,
    dest_path: str,
    *,
    normalize: bool = True,
) -> DataFrame:
    """Remote-CSV seeding (S3 + C1): fetch → parallel CSV scan → *_at
    normalization → atomic parquet overwrite. Replaces the reference's
    200k-row chunk loop (`operations.py:486-513`) with one declarative
    write; returns the seeded table's DataFrame."""
    from python_openetl_spark.plans.pipelines import ParquetTable

    local = fetch_to_local(url)
    df = read_csv(spark, local)
    if normalize:
        df = normalize_timestamps(df)
    table = ParquetTable(dest_path)
    table.overwrite(df)
    return table.read(spark)
