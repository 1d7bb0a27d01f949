"""Source layer tests: CSV/JSON/parquet readers, remote-CSV seeding
(file:// path), JDBC option building (no live DB — plan-level checks),
index→layout hint mapping, registry dispatch."""

from __future__ import annotations

import csv as csvmod

import pytest
from pyspark.sql import functions as F

from python_openetl_spark.sources import connections, files, jdbc, registry
from tests.conftest import SF_DIR


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "people.csv"
    with open(p, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerows([("id", "name", "signed_up_at"), (1, "ada", "2024-01-02 03:04:05"), (2, "bob", "bogus")])
    return str(p)


def test_read_csv_infers_schema(spark, csv_file):
    df = files.read_csv(spark, csv_file)
    assert df.count() == 2
    assert dict(df.dtypes)["id"] == "int"


def test_seed_from_remote_csv_file_url(spark, csv_file, tmp_path):
    got = files.seed_from_remote_csv(
        spark, f"file://{csv_file}", str(tmp_path / "seeded")
    )
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["signed_up_at"] is not None  # parsed
    assert rows[2]["signed_up_at"] is None  # coerced NULL (R11)


def test_registry_dispatch(spark, csv_file):
    assert registry.read(spark, {"format": "csv", "path": csv_file}).count() == 2
    assert (
        registry.read(spark, {"format": "parquet", "path": f"{SF_DIR}/nation.parquet"}).count() == 25
    )
    with pytest.raises(registry.SourceError, match="unknown source format"):
        registry.read(spark, {"format": "nope"})
    with pytest.raises(registry.SourceError, match="BigQuery"):
        registry.read(spark, {"format": "bigquery", "table": "proj.ds.t"})


def test_registry_orc_roundtrip_and_avro_gate(spark, tmp_path):
    path = str(tmp_path / "orc_tbl")
    spark.range(50).withColumnRenamed("id", "k").write.orc(path)
    assert registry.read(spark, {"format": "orc", "path": path}).count() == 50
    with pytest.raises(registry.SourceError, match="Avro"):
        registry.read(spark, {"format": "avro", "path": path})


def test_jdbc_scan_options(spark):
    src = jdbc.JdbcSource(url="jdbc:postgresql://h:5432/db", user="u", password="p")
    reader = jdbc.configure_table_scan(
        spark.read, src, "orders",
        partition_column="o_orderkey", lower_bound=0, upper_bound=1_000_000,
        num_partitions=64,
    )
    opts = reader._jreader.toString()  # smoke only: options applied without error
    assert reader is not None and opts is not None


def test_jdbc_partition_column_requires_bounds(spark):
    src = jdbc.JdbcSource(url="jdbc:postgresql://h:5432/db")
    with pytest.raises(ValueError, match="lower_bound and upper_bound"):
        jdbc.configure_table_scan(
            spark.read, src, "orders", partition_column="o_orderkey"
        )


def test_information_schema_sql():
    q = jdbc.information_schema_query("orders")
    assert "information_schema.columns" in q and "table_name = 'orders'" in q
    q2 = jdbc.pg_indexes_query("orders", schema="s")
    assert "pg_indexes" in q2 and "ORDER BY tablename, indexname" in q2


def test_env_credential_provider(monkeypatch):
    monkeypatch.setenv("HEROKU_PG_DB_URL_FOLLOWER", "postgres://u:p@h:6432/mydb")
    provider = connections.EnvCredentialProvider()
    assert provider("heroku-pg-db-url-follower") == "postgres://u:p@h:6432/mydb"
    with pytest.raises(KeyError, match="NO_SUCH_SECRET"):
        provider("no-such-secret")


def test_secret_manager_provider_gated():
    with pytest.raises(ImportError, match="google-cloud-secret-manager"):
        connections.SecretManagerCredentialProvider("proj")


def test_postgres_source_env_host_and_secret(monkeypatch):
    monkeypatch.setenv("POSTGRES_INSTANCE_IP", "10.0.0.9")
    monkeypatch.setenv("PG_PW", "s3cret")
    src = connections.postgres_source(
        username="app", password_secret="pg-pw", db="etl", port=5433
    )
    assert src.url == "jdbc:postgresql://10.0.0.9:5433/etl"
    assert src.user == "app" and src.password == "s3cret"
    # no env var → reference's 127.0.0.1 default (connections.py:61)
    monkeypatch.delenv("POSTGRES_INSTANCE_IP")
    assert "127.0.0.1" in connections.postgres_source(password="x").url


def test_cloudsql_source_uses_cloudsql_env(monkeypatch):
    monkeypatch.setenv("CLOUD_SQL_INSTANCE_IP", "10.1.1.1")
    monkeypatch.setenv("CLOUDSQL_POSTGRES_DEFAULT_PASSWORD", "pw")
    src = connections.cloudsql_source()
    assert src.url.startswith("jdbc:postgresql://10.1.1.1:5432/")
    assert src.password == "pw"


def test_heroku_source_follower_leader_split(monkeypatch):
    monkeypatch.setenv("HEROKU_PG_DB_URL_FOLLOWER", "postgres://ru:rp@replica:5432/app")
    monkeypatch.setenv("HEROKU_PG_DB_URL_LEADER", "postgres://wu:wp@primary:5432/app")
    read = connections.heroku_source()
    write = connections.heroku_source(for_write=True)
    assert read.url == "jdbc:postgresql://replica:5432/app" and read.user == "ru"
    assert write.url == "jdbc:postgresql://primary:5432/app" and write.password == "wp"


def test_bigquery_spec_table_and_query():
    s = connections.bigquery_spec(project="p", table="ds.t")
    assert s == {
        "format": "bigquery", "parentProject": "p", "table": "ds.t",
        "viewsEnabled": "true",
    }
    s2 = connections.bigquery_spec(
        project="p", query="SELECT 1", materialization_dataset="scratch",
        credentials_json='{"type":"service_account"}',
    )
    assert s2["materializationDataset"] == "scratch" and "query" in s2
    assert "credentials" in s2 and "table" not in s2
    with pytest.raises(ValueError, match="exactly one"):
        connections.bigquery_spec(project="p")
    with pytest.raises(ValueError, match="materialization_dataset"):
        connections.bigquery_spec(project="p", query="SELECT 1")


def test_bigquery_registry_gated_with_full_spec(spark):
    spec = connections.bigquery_spec(project="p", table="ds.t")
    with pytest.raises(registry.SourceError, match="spark-bigquery-connector"):
        registry.read(spark, spec)


def test_bigquery_reader_plan_pins_submitted_options():
    """The exact option dict + load path the gated handler submits,
    asserted without the connector jar (r3 verdict item 6)."""
    table_spec = connections.bigquery_spec(project="p", table="ds.t")
    opts, path = registry.bigquery_reader_plan(table_spec)
    assert path == "ds.t"
    assert opts == {"parentProject": "p", "viewsEnabled": "true"}

    query_spec = connections.bigquery_spec(
        project="p", query="SELECT a FROM ds.t", materialization_dataset="scratch",
        credentials_file="/secrets/sa.json",
    )
    opts, path = registry.bigquery_reader_plan(query_spec)
    assert path is None
    assert opts == {
        "parentProject": "p",
        "query": "SELECT a FROM ds.t",
        "materializationDataset": "scratch",
        "viewsEnabled": "true",
        "credentialsFile": "/secrets/sa.json",
    }
    # every option is already a string — the connector's option API
    # stringifies, so non-strings here would hide type bugs
    assert all(isinstance(v, str) for v in opts.values())
    assert "_2.13:" in registry.BIGQUERY_JAR_COORDINATE  # Spark 4 Scala line


def test_catalog_queries_reject_hostile_identifiers():
    for bad in ("ord'ers", 'o"rders', "orders; drop table x", "a b"):
        with pytest.raises(ValueError, match="identifier"):
            jdbc.information_schema_query(bad)
        with pytest.raises(ValueError, match="identifier"):
            jdbc.pg_indexes_query("orders", schema=bad)


def test_index_layout_hints():
    ddls = [
        'CREATE UNIQUE INDEX orders_pkey ON public.orders USING btree (id)',
        'CREATE INDEX idx_date ON public.orders USING btree (o_orderdate, o_custkey)',
    ]
    hints = jdbc.index_layout_hints(ddls, pk="id")
    assert hints["sort_within_partitions"] == ["o_orderdate", "o_custkey"]


def test_derive_partition_bounds_validates_identifiers(spark):
    src = jdbc.JdbcSource(url="jdbc:postgresql://h:5432/db")
    with pytest.raises(ValueError, match="identifier"):
        jdbc.derive_partition_bounds(spark, src, "orders", "o_orderkey; drop")
    with pytest.raises(ValueError, match="identifier"):
        jdbc.derive_partition_bounds(spark, src, "bad'table", "o_orderkey")


def test_derby_bit_data_types_map_to_binary(spark):
    """functions/normalize.py spark_type_from_derby (r8 advice): Derby
    renders binary columns as 'VARCHAR (n) FOR BIT DATA' — the
    size-strip must collapse the leftover double space so the mapping
    key is reachable, instead of silently degrading binary to string."""
    from python_openetl_spark.functions.normalize import spark_type_from_derby

    rows = [
        ("VARCHAR (255) FOR BIT DATA", "binary"),
        ("CHAR (16) FOR BIT DATA", "binary"),
        ("LONG VARCHAR FOR BIT DATA", "binary"),
        ("VARCHAR(128)", "string"),
        ("CLOB(2147483647)", "string"),
        ("BIGINT NOT NULL", "bigint"),
        ("FRILLY CUSTOM TYPE", "string"),  # unknown degrades to string
    ]
    df = spark.createDataFrame(rows, "data_type string, want string")
    got = df.select(
        spark_type_from_derby(F.col("data_type")).alias("got"), "want"
    ).collect()
    assert all(r["got"] == r["want"] for r in got), got


def test_jsonl_datasource_split_protocol_exact(spark, tmp_path):
    """k17's operator contract (sources/pydatasource.py): the byte-range
    split protocol reads every line exactly once at ANY target_bytes —
    boundaries mid-line, at a line start, at a newline; raw-line mode
    and empty files degrade cleanly; missing JSON keys are NULL."""
    import json
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    p = str(tmp_path / "docs.jsonl")
    rows = [{"doc_id": i, "txt": "x" * (i % 23)} for i in range(200)]
    rows[7] = {"doc_id": 7}  # missing key -> NULL
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    want = sorted((r["doc_id"], r.get("txt")) for r in rows)
    size = os.path.getsize(p)
    for tb in [size + 1, size // 5, 97]:
        df = (
            spark.read.format("openetl_jsonl")
            .option("path", p)
            .option("schema", "doc_id bigint, txt string")
            .option("target_bytes", str(tb))
            .load()
        )
        got = sorted((r["doc_id"], r["txt"]) for r in df.collect())
        assert got == want, f"target_bytes={tb}"
    raw = (
        spark.read.format("openetl_jsonl")
        .option("path", p)
        .option("target_bytes", "997")
        .load()
    )
    assert raw.columns == ["value"] and raw.count() == 200
    empty = str(tmp_path / "empty.jsonl")
    open(empty, "w").close()
    assert (
        spark.read.format("openetl_jsonl").option("path", empty).load().count()
        == 0
    )


def test_jsonl_stream_reader_offsets_are_reproducible(spark, tmp_path):
    """s16's source contract, tested without a streaming query: read()
    walks the file in line-aligned byte offsets covering every row
    exactly once, and readBetweenOffsets(start, end) reproduces each
    batch verbatim — the exactly-once recovery path."""
    import json

    from pyspark.sql.types import StructType

    from python_openetl_spark.sources.pydatasource import JsonlStreamReader

    p = str(tmp_path / "s.jsonl")
    rows = [{"i": i, "s": "y" * (i % 11)} for i in range(97)]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    schema = StructType.fromDDL("i bigint, s string")
    rd = JsonlStreamReader(
        {"path": p, "schema": "i bigint, s string", "batch_bytes": "143"},
        schema,
    )
    off = rd.initialOffset()
    batches, all_rows = [], []
    while True:
        it, nxt = rd.read(off)
        got = list(it)
        if nxt == off:
            assert got == []
            break
        assert got, "non-final batch must carry rows"
        batches.append((off, nxt, got))
        all_rows.extend(got)
        off = nxt
    assert len(batches) >= 3  # really multi-batch at this batch_bytes
    assert all_rows == [(r["i"], r["s"]) for r in rows]  # exact, in order
    # recovery: every (start, end) slice replays identically
    for start, end, got in batches:
        assert list(rd.readBetweenOffsets(start, end)) == got


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """k18's writer contract: temp parts publish only at driver commit
    (no _temporary leftovers, no orphans), overwrite replaces prior parts,
    NULL fields serialize as JSON null and read back as NULL, and the
    reader's directory mode scans all parts."""
    import json
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "out")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "doc_id long, txt string"
    ).repartition(3)
    df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    names = sorted(os.listdir(out))
    assert all(n.startswith("part-") and n.endswith(".jsonl") for n in names)
    assert not os.path.isdir(os.path.join(out, "_temporary"))
    back = (
        spark.read.format("openetl_jsonl")
        .option("path", out)
        .option("schema", "doc_id bigint, txt string")
        .load()
    )
    got = sorted((r["doc_id"], r["txt"]) for r in back.collect())
    assert got == [(1, "a"), (2, None), (3, "c")]
    # append CONTINUES part numbering — a second write must never
    # os.replace over the first generation's committed parts
    df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    back_app = (
        spark.read.format("openetl_jsonl")
        .option("path", out)
        .option("schema", "doc_id bigint, txt string")
        .load()
    )
    assert back_app.count() == 6  # both generations present
    # overwrite drops every previous generation of parts
    df.limit(1).write.format("openetl_jsonl").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = (
        spark.read.format("openetl_jsonl")
        .option("path", out)
        .option("schema", "doc_id bigint, txt string")
        .load()
    )
    assert back2.count() == 1


def test_jsonl_stream_reader_waits_for_partial_trailing_line(spark, tmp_path):
    """Round-10 review: a record mid-write (no trailing newline yet)
    must NOT be consumed — the offset stays at its start and the next
    batch picks it up whole once the newline lands (the append-log
    rule; parsing the fragment crashed JSON mode before)."""
    import json

    from pyspark.sql.types import StructType

    from python_openetl_spark.sources.pydatasource import JsonlStreamReader

    p = str(tmp_path / "live.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"i": 1}) + "\n")
        f.write('{"i": 2')  # partial record, producer mid-write
    schema = StructType.fromDDL("i bigint")
    rd = JsonlStreamReader(
        {"path": p, "schema": "i bigint", "batch_bytes": "4096"}, schema
    )
    it, off = rd.read(rd.initialOffset())
    assert list(it) == [(1,)]
    # offset parked at the partial line's start
    assert off["pos"] == len(json.dumps({"i": 1})) + 1
    # producer finishes the record -> next batch reads it whole
    with open(p, "a") as f:
        f.write(', "x": 3}\n')
    it2, off2 = rd.read(off)
    assert list(it2) == [(2,)]
    assert off2["pos"] > off["pos"]


def test_jsonl_writer_serializes_temporal_columns(spark, tmp_path):
    """r10 review: json.dumps choked on datetime/Decimal values —
    default=str now serializes them (ISO-8601), so a timestamp column
    writes instead of failing every task."""
    import json
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "t")
    os.makedirs(out)
    df = spark.sql(
        "SELECT 1 AS id, timestamp'2024-01-02 03:04:05' AS ts,"
        " CAST(1.5 AS DECIMAL(10,2)) AS d"
    )
    df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    part = [n for n in os.listdir(out) if n.endswith(".jsonl")][0]
    row = json.loads(open(os.path.join(out, part)).read())
    assert row["id"] == 1 and row["ts"].startswith("2024-01-02 03:04:05")
    assert row["d"] == "1.50"


def test_postgres_url_keeps_query_and_defaults_empty_db():
    """r10 review: the query string (sslmode etc.) must survive into
    the JDBC URL, and a bare '/' path takes the documented 'postgres'
    default instead of an empty db name."""
    from python_openetl_spark.sources.connections import (
        jdbc_url_from_postgres_url,
    )

    url, user, pw = jdbc_url_from_postgres_url(
        "postgres://u:p@h:5433/mydb?sslmode=require&connect_timeout=5"
    )
    assert url == "jdbc:postgresql://h:5433/mydb?sslmode=require&connect_timeout=5"
    assert (user, pw) == ("u", "p")
    url2, _, _ = jdbc_url_from_postgres_url("postgres://h/")
    assert url2 == "jdbc:postgresql://h:5432/postgres"


def test_index_layout_hints_skip_expression_indexes():
    """r10 review: a functional index like lower((email)::text) used to
    yield the garbage hint column 'lower((email'; expression indexes
    now contribute no hint, plain-column indexes still do."""
    from python_openetl_spark.sources.jdbc import index_layout_hints

    hints = index_layout_hints(
        [
            "CREATE INDEX i1 ON t USING btree (lower((email)::text))",
            "CREATE INDEX i2 ON t USING btree (created_at, status)",
            "CREATE UNIQUE INDEX pk ON t USING btree (id)",
        ],
        pk="id",
    )
    assert hints == {"sort_within_partitions": ["created_at", "status"]}


def test_index_layout_hints_partial_index_where_clause():
    """r11 advice: on a partial index 'ON t (col) WHERE (x > 5)' the
    greedy paren match captured 'col) WHERE (x > 5' and the identifier
    filter dropped the valid 'col' hint. The WHERE clause is stripped
    first; its predicate columns are never hints."""
    from python_openetl_spark.sources.jdbc import index_layout_hints

    hints = index_layout_hints(
        [
            "CREATE INDEX i1 ON t USING btree (status) WHERE (deleted_at IS NULL)",
            "CREATE INDEX i2 ON t USING btree (region, tier) WHERE (score > 5)",
            # expression index + WHERE: still no garbage hint
            "CREATE INDEX i3 ON t USING btree (lower((email)::text)) WHERE (x > 1)",
        ],
        pk="id",
    )
    assert hints == {"sort_within_partitions": ["status", "region", "tier"]}


def test_jsonl_writer_append_skips_gaps_in_part_numbering(spark, tmp_path):
    """r11 advice: append numbered new parts from the COUNT of existing
    part files; a non-contiguous directory (crashed prior commit or a
    manually removed part) made the count collide with a surviving
    higher-numbered part, which os.replace silently overwrote. Base is
    now max(existing)+1."""
    import json
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "gappy")
    os.makedirs(out)
    # non-contiguous survivors: 00000 and 00002 (00001 lost to a crash)
    with open(os.path.join(out, "part-00000.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 100, "txt": "keep0"}) + "\n")
    with open(os.path.join(out, "part-00002.jsonl"), "w") as f:
        f.write(json.dumps({"doc_id": 102, "txt": "keep2"}) + "\n")
    df = spark.createDataFrame([(1, "new")], "doc_id long, txt string").coalesce(1)
    df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    # the surviving part-00002 must be untouched
    with open(os.path.join(out, "part-00002.jsonl")) as f:
        assert json.loads(f.readline())["txt"] == "keep2"
    names = sorted(
        n for n in os.listdir(out) if n.startswith("part-") and n.endswith(".jsonl")
    )
    assert names == ["part-00000.jsonl", "part-00002.jsonl", "part-00003.jsonl"]
    back = (
        spark.read.format("openetl_jsonl")
        .option("path", out)
        .option("schema", "doc_id bigint, txt string")
        .load()
    )
    got = sorted((r["doc_id"], r["txt"]) for r in back.collect())
    assert got == [(1, "new"), (100, "keep0"), (102, "keep2")]


def test_jsonl_datasource_crlf_all_boundary_placements(spark, tmp_path):
    """r10 verdict #4 hostile shape: CRLF-terminated files. The split
    protocol must stay exact when a byte boundary lands BETWEEN the
    '\\r' and the '\\n' (readline consumes through the newline either
    way; '\\r' is stripped with the terminator) — sweep every boundary
    placement on a small file to prove it."""
    import json
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    p = str(tmp_path / "crlf.jsonl")
    rows = [{"i": i, "s": "z" * (i % 5)} for i in range(12)]
    with open(p, "wb") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True).encode() + b"\r\n")
    want = sorted((r["i"], r["s"]) for r in rows)
    size = os.path.getsize(p)
    # every boundary placement (incl. mid-CRLF) at the reader level —
    # no Spark job per placement, same code path the executors run
    from pyspark.sql.types import StructType

    from python_openetl_spark.sources.pydatasource import JsonlReader

    schema = StructType.fromDDL("i bigint, s string")
    for tb in range(1, size + 2):
        rd = JsonlReader(
            {"path": p, "schema": "i bigint, s string", "target_bytes": str(tb)},
            schema,
        )
        got = sorted(
            row for part in rd.partitions() for row in rd.read(part)
        )
        assert got == want, f"target_bytes={tb}"
    # and a few placements through the full Spark scan
    for tb in [size + 1, size // 3, 17]:
        df = (
            spark.read.format("openetl_jsonl")
            .option("path", p)
            .option("schema", "i bigint, s string")
            .option("target_bytes", str(tb))
            .load()
        )
        got = sorted((r["i"], r["s"]) for r in df.collect())
        assert got == want, f"target_bytes={tb}"


def test_jsonl_datasource_dir_without_parts_and_default_split(spark, tmp_path):
    """A directory containing no *.jsonl parts reads as empty (the
    writer's pre-first-commit layout); a file far smaller than the
    default 4 MiB split reads whole in one partition."""
    import json
    import os

    from pyspark.sql.types import StructType

    from python_openetl_spark.sources.pydatasource import (
        JsonlDataSource,
        JsonlReader,
    )

    spark.dataSource.register(JsonlDataSource)
    d = str(tmp_path / "emptydir")
    os.makedirs(d)
    open(os.path.join(d, "notes.txt"), "w").write("not a part\n")
    df = (
        spark.read.format("openetl_jsonl")
        .option("path", d)
        .option("schema", "i bigint")
        .load()
    )
    assert df.count() == 0
    p = str(tmp_path / "small.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"i": 1}) + "\n")
    rd = JsonlReader({"path": p, "schema": "i bigint"}, StructType.fromDDL("i bigint"))
    assert len(rd.partitions()) == 1  # default target_bytes, one split
    got = (
        spark.read.format("openetl_jsonl")
        .option("path", p)
        .option("schema", "i bigint")
        .load()
        .collect()
    )
    assert [r["i"] for r in got] == [1]


def test_jsonl_stream_reader_sees_appended_lines(spark, tmp_path):
    """r10 verdict #4 hostile shape: a producer APPENDING between
    micro-batches. The stream reader's offset walk must pick up every
    newline-terminated record written after earlier batches, including
    CRLF records, without re-reading old ones."""
    import json

    from pyspark.sql.types import StructType

    from python_openetl_spark.sources.pydatasource import JsonlStreamReader

    p = str(tmp_path / "grow.jsonl")
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps({"i": i}) + "\n")
    rd = JsonlStreamReader(
        {"path": p, "schema": "i bigint", "batch_bytes": "1048576"},
        StructType.fromDDL("i bigint"),
    )
    it, off1 = rd.read(rd.initialOffset())
    assert [r[0] for r in it] == [0, 1, 2]
    # EOF: same offset back, no rows
    it, off_same = rd.read(off1)
    assert list(it) == [] and off_same == off1
    # append two complete records (one CRLF) + one partial
    with open(p, "ab") as f:
        f.write(json.dumps({"i": 3}).encode() + b"\n")
        f.write(json.dumps({"i": 4}).encode() + b"\r\n")
        f.write(b'{"i": 5')  # mid-write, no newline yet
    it, off2 = rd.read(off1)
    assert [r[0] for r in it] == [3, 4]
    # the partial record is not consumed and the offset parks before it
    it, off3 = rd.read(off2)
    assert list(it) == [] and off3 == off2
    with open(p, "ab") as f:
        f.write(b"}\n")
    it, off4 = rd.read(off2)
    assert [r[0] for r in it] == [5]
    # recovery replay of the grown slice is verbatim
    assert [r[0] for r in rd.readBetweenOffsets(off1, off2)] == [3, 4]


def test_jsonl_writer_commit_lock_single_writer(spark, tmp_path):
    """r10 verdict #7: the driver commit is a guarded critical section.
    A held _commit.lock makes a second writer fail LOUDLY (no silent
    part-number interleaving); a successful commit removes the lock;
    a failed commit attempt publishes nothing."""
    import os

    from python_openetl_spark.sources.pydatasource import JsonlDataSource

    spark.dataSource.register(JsonlDataSource)
    out = str(tmp_path / "locked")
    os.makedirs(out)
    df = spark.createDataFrame([(1, "a")], "doc_id long, txt string").coalesce(1)
    # simulate a concurrent committer holding the lock
    with open(os.path.join(out, "_commit.lock"), "w") as f:
        f.write("pid=other\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="single-writer|_commit.lock"):
        df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    assert not any(n.endswith(".jsonl") for n in os.listdir(out)), "nothing published"
    # release the lock: the write proceeds and cleans up after itself
    os.remove(os.path.join(out, "_commit.lock"))
    df.write.format("openetl_jsonl").option("path", out).mode("append").save()
    names = os.listdir(out)
    assert "part-00000.jsonl" in names and "_commit.lock" not in names
