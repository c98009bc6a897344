"""Additional source/sink formats beyond the reference's CSV family:
JSON-lines and ORC roundtrips (explicit schemas, format-native pushdown)
and a small-files compaction pass.

JSON-lines is the interchange format most document-corpus pipelines
ingest; ORC is the other columnar format Spark reads natively with
predicate pushdown. Both readers take explicit schemas — at 100 TB schema
inference is an extra full pass with nondeterministic typing, same policy
as csv_sources.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → gzip JSON-lines sink → schema'd JSON source. Timestamps
    serialize as ISO-8601 strings and parse back exactly (µs precision);
    filter pushdown applies post-parse (JSON has no footer statistics —
    the reason parquet/ORC remain the at-rest formats and JSON is
    ingest-only)."""
    work = tempfile.mkdtemp(prefix="cdbspark_json_")
    path = os.path.join(work, "events_jsonl")
    # explicit µs timestamp format: the default SSS truncates to millis
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    load(spark, sf_dir, "events").write.mode("overwrite").option(
        "compression", "gzip"
    ).option("timestampFormat", ts_fmt).json(path)
    return (
        spark.read.schema(EVENTS_DDL)
        .option("timestampFormat", ts_fmt)
        .json(path)
        .filter(F.col("event_type") != "view")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


JSON_ROUNDTRIP_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE event_type <> 'view'
"""


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC sink → ORC source with a pushed-down predicate (ORC
    carries min/max stripe statistics like parquet, so the filter prunes
    stripes at scan time)."""
    work = tempfile.mkdtemp(prefix="cdbspark_orc_")
    path = os.path.join(work, "orders_orc")
    load(spark, sf_dir, "orders").write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


ORC_ROUNDTRIP_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders WHERE o_totalprice > 300000
"""


MANIFEST = "MANIFEST"


def _read_manifest(base: str, name: str = MANIFEST):
    import json

    mp = os.path.join(base, name)
    if not os.path.exists(mp):
        return None
    with open(mp, encoding="utf-8") as fh:
        return json.load(fh)


def _write_manifest(base: str, manifest: dict, name: str = MANIFEST) -> None:
    """Atomically (POSIX rename) replace the pointer file — the single
    commit point of every table mutation. On an object store this is one
    PUT of the pointer object. ``name`` lets co-located-with-data callers
    (the ANN index) use an underscore-prefixed file Spark's directory
    listing ignores."""
    import json

    tmp = os.path.join(base, name + ".tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(manifest))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(base, name))


def resolve_data_dir(path: str, version: int | None = None):
    """(data_dir, manifest) for a table root: versioned tables resolve
    through their MANIFEST pointer; a plain parquet directory resolves to
    itself (manifest None). ``version`` time-travels to a retained
    snapshot — version directories are immutable, so any un-vacuumed
    version reads exactly as committed."""
    base = path.rstrip("/")
    m = _read_manifest(base)
    if m is None:
        if version is not None:
            raise ValueError(f"{path} is not a versioned table")
        return base, None
    if version is None:
        return os.path.join(base, m["version_dir"]), m
    name = f"v_{int(version):08d}"
    target = os.path.join(base, name)
    if not os.path.isdir(target):
        raise ValueError(
            f"version {version} of {path} is not retained (vacuumed or never "
            f"written); current is {m['version']}"
        )
    return target, {"version": int(version), "version_dir": name}


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Reader entry point for (possibly versioned) parquet tables;
    ``version`` reads a retained historical snapshot (time travel)."""
    return spark.read.parquet(resolve_data_dir(path, version)[0])


def list_versions(path: str) -> list[int]:
    """Retained snapshot versions, ascending."""
    base = path.rstrip("/")
    return sorted(
        int(n[2:])
        for n in os.listdir(base)
        if n.startswith("v_") and os.path.isdir(os.path.join(base, n))
    )


def vacuum_versions(path: str, keep: int = 2) -> list[int]:
    """Retention-based vacuum: drop all but the newest ``keep`` retained
    versions (the current version is always kept). Returns the removed
    version numbers. This is the explicit form of the keep-predecessor
    policy compaction applies automatically; at scale it runs on a
    maintenance schedule with ``keep`` sized to the longest reader."""
    import shutil

    base = path.rstrip("/")
    m = _read_manifest(base)
    if m is None:
        raise ValueError(f"{path} is not a versioned table")
    keep = max(1, int(keep))
    versions = list_versions(base)
    current = int(m["version"])
    survivors = set(versions[-keep:]) | {current}
    removed = [v for v in versions if v not in survivors]
    for v in removed:
        shutil.rmtree(os.path.join(base, f"v_{v:08d}"))
    return removed


def _adopt_versioned(spark: SparkSession, base: str) -> dict:
    """One-time migration of a plain parquet directory into the versioned
    layout: move its files into ``v_00000001/`` and commit a manifest.
    This is the only step that mutates a directory readers may be scanning
    directly — run it when the table is created / before serving readers;
    afterwards every mutation is an atomic pointer flip."""
    vdir = "v_00000001"
    target = os.path.join(base, vdir)
    os.makedirs(target, exist_ok=True)
    for name in os.listdir(base):
        if name in (vdir, MANIFEST) or name.startswith(MANIFEST):
            continue
        os.rename(os.path.join(base, name), os.path.join(target, name))
    rows = spark.read.parquet(target).count()  # once, at adoption only
    manifest = {"version": 1, "version_dir": vdir, "rows": int(rows)}
    _write_manifest(base, manifest)
    return manifest


def compact_small_files(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Small-files compaction: rewrite a parquet table into size-targeted
    files (total bytes / target). The streaming/incremental sinks append
    one file per micro-batch — at scale the resulting million-file
    directories destroy scan planning; periodic compaction is part of the
    sink contract.

    Reader-safe swap: the table root holds immutable ``v_NNNNNNNN/`` data
    directories plus a ``MANIFEST`` pointer file; readers resolve through
    :func:`resolve_data_dir` / :func:`read_table`. The compacted copy is
    written to the NEXT version directory and committed by one atomic
    ``os.replace`` of the pointer (on an object store: one PUT) — a reader
    can never observe a missing or partial directory, unlike dir-rename
    swaps (two renames leave a no-directory window, and object-store
    renames are not atomic at all). A crash before the pointer flip leaves
    the old version serving and an orphan next-version dir that the next
    compaction vacuums. The immediately-previous version stays on disk for
    in-flight readers and is vacuumed by the compaction after it (at
    scale: retention-based vacuum).

    The row gate uses the WRITE JOB's own Observation metric against the
    manifest's recorded count — no verify re-read of the output. First
    call on a plain directory adopts it via :func:`_adopt_versioned`.
    Returns the new file count."""
    import shutil

    from pyspark.sql import Observation

    base = path.rstrip("/")
    m = _read_manifest(base)
    if m is None:
        m = _adopt_versioned(spark, base)
    data_dir = os.path.join(base, m["version_dir"])
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, total // (target_file_mb * 1024 * 1024))
    next_ver = int(m["version"]) + 1
    next_name = f"v_{next_ver:08d}"
    next_dir = os.path.join(base, next_name)
    if os.path.exists(next_dir):  # orphan from a crashed earlier attempt
        shutil.rmtree(next_dir)
    obs = Observation(f"compact_{next_name}")
    df = spark.read.parquet(data_dir).observe(obs, F.count(F.lit(1)).alias("rows"))
    df.repartition(int(n_files)).write.mode("overwrite").parquet(next_dir)
    rows_written = int(obs.get["rows"])
    if rows_written != int(m["rows"]):  # paranoia gate, no re-read
        shutil.rmtree(next_dir)
        raise RuntimeError(
            f"compaction row-count mismatch for {path}: "
            f"wrote {rows_written}, manifest says {m['rows']}"
        )
    prev_keep = m["version_dir"]
    # carry forward content markers (e.g. gdpr_erase's erased_tag):
    # compaction changes LAYOUT, not content, so idempotency tags survive
    extras = {
        k: v
        for k, v in m.items()
        if k not in ("version", "version_dir", "rows")
    }
    _write_manifest(
        base,
        {**extras, "version": next_ver, "version_dir": next_name, "rows": rows_written},
    )
    # vacuum everything except the new version and its immediate
    # predecessor (kept for readers that resolved before the flip)
    for name in os.listdir(base):
        if (
            name.startswith("v_")
            and name not in (next_name, prev_keep)
            and os.path.isdir(os.path.join(base, name))
        ):
            shutil.rmtree(os.path.join(base, name))
    return int(n_files)


def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source: two parquet batches written at
    different schema VERSIONS (v2 adds a ``price_band`` column) read back
    as ONE table via ``mergeSchema`` — v1 rows surface NULL for the added
    column, the standard additive-evolution contract (Delta/Iceberg do
    the same resolution from their metadata; plain parquet pays one
    footer-merge pass, which is why ``mergeSchema`` stays opt-in at
    100 TB and table formats keep the schema in the manifest instead).

    Deterministic batch split (o_orderkey parity) so the oracle twin is a
    plain UNION ALL."""
    work = tempfile.mkdtemp(prefix="cdbspark_evo_")
    o = load(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") > 200000, F.lit("high"))
        .otherwise(F.lit("low"))
        .alias("price_band"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(work, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(work, "batch=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(work, "batch=1"), os.path.join(work, "batch=2"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "price_band")
    )


SCHEMA_EVOLUTION_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS price_band
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice,
       CASE WHEN o_totalprice > 200000 THEN 'high' ELSE 'low' END AS price_band
FROM orders WHERE o_orderkey % 2 = 1
"""


CORRUPT_EVERY = 100


def corrupt_tolerant_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance at the source: write events as
    JSON-lines with every ``CORRUPT_EVERY``-th line deterministically
    truncated mid-record (the classic upstream-producer bug), then read
    in PERMISSIVE mode with an explicit ``_corrupt_record`` column —
    good rows parse, bad rows land whole in the quarantine column
    instead of killing the job (FAILFAST) or vanishing silently
    (DROPMALFORMED without audit). Output: the parsed good rows; the
    quarantine count is asserted in tests.

    The corruption is keyed on event_id parity (event_id % CORRUPT_EVERY
    == 0), so the oracle is a plain filter on the clean table."""
    work = tempfile.mkdtemp(prefix="cdbspark_corrupt_")
    path = os.path.join(work, "events_dirty")
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    clean_dir = os.path.join(work, "clean")
    ev.coalesce(1).write.mode("overwrite").option("timestampFormat", ts_fmt).json(
        clean_dir
    )
    os.makedirs(path, exist_ok=True)
    import json as _json

    with open(os.path.join(path, "part-00000.json"), "w") as out:
        for fn in sorted(os.listdir(clean_dir)):
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(clean_dir, fn)) as f:
                for line in f:
                    rec = _json.loads(line)
                    if rec["event_id"] % CORRUPT_EVERY == 0:
                        out.write(line[: max(10, len(line) // 2)].rstrip() + "\n")
                    else:
                        out.write(line)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, _corrupt_record string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("timestampFormat", ts_fmt)
        .json(path)
        # Spark disallows queries whose referenced columns prune down to
        # ONLY the internal corrupt-record column (a count() through the
        # quarantine filter does exactly that); its documented contract is
        # to cache or save the parsed result first. At scale this cache is
        # the quarantine write the pipeline does anyway.
        .cache()
    )
    return raw.filter(F.col("_corrupt_record").isNull()).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


CORRUPT_TOLERANT_SQL = f"""
SELECT event_id, ts, user_id, event_type, value
FROM events WHERE event_id % {CORRUPT_EVERY} <> 0
"""


def gdpr_erase(spark: SparkSession, path: str, predicate, tag: str) -> None:
    """Right-to-erasure pass over a versioned table: rewrite the current
    version WITHOUT the rows matching ``predicate`` and commit the result
    as the next version via the same atomic manifest flip as compaction —
    readers never see a partial table, and the job is a plain anti-filter
    scan-and-write (the parquet reality behind DELETE: immutable files
    mean erasure is a rewrite, which is why erasure batches are queued
    and amortized, not run per request).

    Compliance caveat the versioning makes explicit: the PREVIOUS version
    still contains the erased rows until :func:`vacuum_versions` drops it
    — "deleted" means unreachable-by-pointer first and physically gone
    only after retention. ``tag`` marks the manifest so a re-run with the
    same tag is a no-op (idempotent maintenance job).
    """
    base = path.rstrip("/")
    m = _read_manifest(base)
    if m is None:
        m = _adopt_versioned(spark, base)
    if m.get("erased_tag") == tag:
        return
    from pyspark.sql import Observation

    src = spark.read.parquet(os.path.join(base, m["version_dir"]))
    next_v = int(m["version"]) + 1
    vdir = f"v_{next_v:08d}"
    obs = Observation(f"gdpr_{next_v}")
    # DELETE-WHERE semantics: a NULL predicate row is NOT matched, so it
    # must be kept — ~NULL is NULL and a bare filter would drop it
    kept = src.filter(~F.coalesce(predicate, F.lit(False))).observe(
        obs, F.count(F.lit(1)).alias("rows")
    )
    kept.write.mode("overwrite").parquet(os.path.join(base, vdir))
    _write_manifest(
        base,
        {
            "version": next_v,
            "version_dir": vdir,
            "rows": int(obs.get["rows"]),
            "erased_tag": tag,
        },
    )


def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → XML sink → schema'd XML source (Spark 4's built-in XML
    data source — spark-xml graduated into core). XML is the
    enterprise-ingest format (feeds, SOAP exports); like JSON it has no
    footer statistics, so it stays ingest-only and lands in parquet.
    Explicit read schema — XML inference would widen ints and reorder
    fields. Customer is the all-scalar table (no timestamps: XML
    timestamp round-tripping is format-option-dependent; the JSON twin
    covers that axis)."""
    work = tempfile.mkdtemp(prefix="cdbspark_xml_")
    path = os.path.join(work, "customer_xml")
    ddl = (
        "c_custkey long, c_name string, c_nationkey long, "
        "c_mktsegment string, c_acctbal double"
    )
    load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    ).write.mode("overwrite").format("xml").option("rowTag", "customer").save(path)
    return (
        spark.read.format("xml")
        .schema(ddl)
        .option("rowTag", "customer")
        .load(path)
        .filter(F.col("c_acctbal") > 0)
    )


XML_ROUNDTRIP_SQL = """
SELECT c_custkey, c_name, c_nationkey, c_mktsegment, c_acctbal
FROM customer WHERE c_acctbal > 0
"""
