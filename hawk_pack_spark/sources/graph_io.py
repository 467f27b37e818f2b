"""Index persistence — the GraphStore durability surface.

The reference persists the graph one row per (vector, layer) with a
JSONB neighbor queue plus a singleton entry-point row in Postgres
(migrations/20240909105321_init.up.sql; graph_pg.rs). Here the native
store is parquet, partitioned by shard so a reload co-locates each
shard's subgraph (one file group per kernel task — no shuffle on load).
A JDBC export mirrors the reference's Postgres layout for
interoperability; it is gated on a reachable JDBC driver.

Note graph_pg.rs leaves num_layers unimplemented (todo!) — implemented
here as max(layer)+1 over the links view.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def save_index(index_df: DataFrame, path: str) -> None:
    index_df.write.mode("overwrite").partitionBy("shard").parquet(path)


def load_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def num_layers(links: DataFrame) -> int:
    """Count of layers (graph_pg.rs:125-127 todo!, graph_mem.rs:123-126)."""
    top = links.agg(F.max("layer")).collect()[0][0]
    return 0 if top is None else int(top) + 1


# ---------------------------------------------------------------------------
# Postgres row layout (migrations/20240909105321_init.up.sql):
#   hawk_graph_links(source_ref text, layer integer, links jsonb,
#                    PRIMARY KEY (source_ref, layer))
#   hawk_graph_entry(entry_point jsonb, id integer PRIMARY KEY)
# The jsonb values mirror graph_pg.rs's serde encoding: a neighbor queue
# serializes as [[vector_ref, distance], ...] (FurthestQueue is a
# Vec<(V, D)>), the entry point as {"point": ..., "layer": n}
# (EntryPoint struct, graph_store/mod.rs:14-18). These converters are the
# layout contract; JDBC is just one transport for the same rows.
#
# The vector ref is an INTEGER in the reference's serde (Vec<(V, D)> with
# integer V) — to_json over a uniform double array would render refs as
# 42.0 and silently lose precision above 2^53, so the pair array is
# rendered with format_string instead: [[42,1.5],...] with the ref as an
# exact integer literal at any id width.


def _links_json() -> Column:
    """nbrs ARRAY<STRUCT<dist,dst>> → the reference's [[ref, dist], ...]
    JSON text, refs as exact integer literals."""
    return F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                "nbrs",
                lambda x: F.format_string(
                    "[%s,%s]",
                    x["dst"].cast("string"),
                    x["dist"].cast("double").cast("string"),
                ),
            ),
            ",",
        ),
        F.lit("]"),
    )


def to_pg_rows(links: DataFrame, entries: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Normalized links/entry views → the reference's Postgres row shapes.

    Returns (links_rows, entry_rows). ``entries`` is the per-shard entry
    table of `hnsw.entry_points`; the reference keeps ONE row (id=0,
    graph_pg.rs:69-80) because it is single-index — per-shard rows keyed
    by shard id generalize that (id = shard)."""
    links_rows = links.select(
        F.col("src").cast("string").alias("source_ref"),
        F.col("layer").cast("int").alias("layer"),
        _links_json().alias("links"),
    )
    entry_rows = entries.select(
        F.to_json(
            F.struct(F.col("point").alias("point"), F.col("layer").alias("layer"))
        ).alias("entry_point"),
        F.col("shard").cast("int").alias("id"),
    )
    return links_rows, entry_rows


def from_pg_rows(
    links_rows: DataFrame, entry_rows: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Inverse of `to_pg_rows`: parse the Postgres row shapes back into
    the normalized links view (layer, src, nbrs ARRAY<STRUCT<dist,dst>>)
    and entry table (shard, point, layer).

    The pair text is split manually (regexp over the inner [ref,dist]
    pairs) rather than from_json'd as array<array<double>>, so integer
    refs parse exactly at any id width; the ref column tolerates both
    the integer form this module writes and a float form (42.0) that a
    foreign writer might emit."""
    inner = F.expr(r"regexp_extract_all(links, '\\[([^\\[\\]]+)\\]', 1)")
    links = links_rows.select(
        F.col("source_ref").cast("long").alias("src"),
        F.col("layer").cast("int").alias("layer"),
        F.transform(
            inner,
            lambda s: F.struct(
                F.split(s, ",")[1].cast("double").alias("dist"),
                F.coalesce(
                    F.split(s, ",")[0].try_cast("long"),
                    F.split(s, ",")[0].cast("double").cast("long"),
                ).alias("dst"),
            ),
        ).alias("nbrs"),
    )
    ep = F.from_json(F.col("entry_point"), "struct<point: long, layer: int>")
    entries = entry_rows.select(
        F.col("id").cast("int").alias("shard"),
        ep["point"].alias("point"),
        ep["layer"].alias("layer"),
    )
    return links, entries


def _jdbc_writer(df: DataFrame, url: str, table: str, mode: str, driver: str | None):
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    w.mode(mode).save()


def export_links_jdbc(
    links: DataFrame,
    url: str | None = None,
    table: str = "hawk_graph_links",
    mode: str = "overwrite",
    driver: str | None = None,
) -> bool:
    """Export the normalized links view to the reference's Postgres
    layout over JDBC. Returns False (no-op) when no JDBC URL is
    configured. The layout contract is database-agnostic: the live
    round-trip is exercised against embedded Derby (the only dockerless
    database this container ships — tests/test_graph_store.py::
    test_jdbc_roundtrip_derby); against Postgres only the URL changes."""
    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return False
    rows = links.select(
        F.col("src").cast("string").alias("source_ref"),
        F.col("layer"),
        _links_json().alias("links"),
    )
    _jdbc_writer(rows, url, table, mode, driver)
    return True


def export_graph_jdbc(
    links: DataFrame,
    entries: DataFrame,
    url: str | None = None,
    driver: str | None = None,
    links_table: str = "hawk_graph_links",
    entry_table: str = "hawk_graph_entry",
    mode: str = "overwrite",
    schema: str | None = None,
) -> bool:
    """Export the full GraphStore state (links + entry points) in the
    reference's two-table Postgres layout (init.up.sql:1-12). This is
    the bulk-snapshot path (table replace, Spark-created column types);
    `upsert_graph_jdbc` is the row-level delta path against a
    migration-typed schema."""
    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return False
    links_rows, entry_rows = to_pg_rows(links, entries)
    _jdbc_writer(links_rows, url, _qualified(schema, links_table), mode, driver)
    _jdbc_writer(entry_rows, url, _qualified(schema, entry_table), mode, driver)
    return True


# ---------------------------------------------------------------------------
# upsert transport — the reference's write path is row-level UPSERT, not
# table replace: graph_pg.rs:111-115 `INSERT ... ON CONFLICT (source_ref,
# layer) DO UPDATE SET links = EXCLUDED.links` (and :69-80 the same for
# the entry row). `export_graph_jdbc` above replaces whole tables (bulk
# snapshot); `upsert_graph_jdbc` merges a DELTA of rows into live tables,
# so incremental insert/delete/repair can persist without rewriting the
# graph. Spark's JDBC writer has no upsert mode, so the delta stages
# through Spark JDBC and one driver-side MERGE/ON CONFLICT statement —
# executed over the same JVM DriverManager the JDBC source uses — moves
# it into the target atomically per statement.

# PG target tables are jsonb, matching the reference migration exactly
# (20240909105321_init.up.sql declares links/entry_point jsonb) — a
# reference GraphPg process can decode helper-created tables (ADVICE r5).
# Staging always goes through TEXT (Spark's JDBC writer cannot emit
# jsonb); the upsert statement casts stage TEXT → target jsonb.
_PG_LINK_TYPES = "source_ref VARCHAR(64), layer INTEGER, links jsonb"
_PG_LINK_STAGE_TYPES = "source_ref VARCHAR(64), layer INTEGER, links TEXT"
_DERBY_LINK_TYPES = "source_ref VARCHAR(64), layer INTEGER, links VARCHAR(32000)"
_PG_ENTRY_TYPES = "entry_point jsonb, id INTEGER"
_PG_ENTRY_STAGE_TYPES = "entry_point TEXT, id INTEGER"
_DERBY_ENTRY_TYPES = "entry_point VARCHAR(1000), id INTEGER"

# Derby SQLStates that make a CREATE idempotent-safe to swallow:
# X0Y32 = schema object (table/index) already exists, X0Y68 = schema
# already exists. EVERYTHING else (bad URL grammar, permissions, disk)
# re-raises — a swallowed real failure resurfaces later as a confusing
# MERGE error (ADVICE r5).
_EXISTS_STATES = ("X0Y32", "X0Y68", "already exists")


def _dialect(url: str) -> str:
    return "postgresql" if url.startswith("jdbc:postgresql") else "standard"


def _qualified(schema: str | None, table: str) -> str:
    return f"{schema}.{table}" if schema else table


def _query_scalar(spark: SparkSession, url: str, driver: str | None,
                  sql: str):
    """One scalar SELECT over the same JVM DriverManager as
    `_exec_updates`. Returns the first column of the first row as a
    string, or None on an empty result."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            try:
                return rs.getString(1) if rs.next() else None
            finally:
                rs.close()
        finally:
            st.close()
    finally:
        conn.close()


def _pg_links_type_sql(links_table: str, schema: str | None) -> str:
    """information_schema probe for the live links-column type — the
    jsonb autodetection query (ADVICE r6 #2: a pre-jsonb release created
    TEXT targets, and Postgres has no implicit jsonb→text assignment
    cast, so blindly casting the stage to jsonb breaks legacy
    databases). Scoped to the current search_path schema when no
    explicit schema is given."""
    scope = (
        f"table_schema = '{schema}'" if schema
        else "table_schema = current_schema()"
    )
    return (
        "SELECT data_type FROM information_schema.columns "
        f"WHERE {scope} AND table_name = '{links_table}' "
        "AND column_name = 'links'"
    )


def _exec_updates(spark: SparkSession, url: str, driver: str | None,
                  statements: list[str], ignore_existing: bool = False) -> None:
    """Run DDL/DML on the driver through java.sql.DriverManager — the
    same JVM + driver classpath Spark's JDBC source uses, so reachability
    is identical. ``ignore_existing`` swallows ONLY the already-exists
    errors (Derby X0Y32/X0Y68, or an 'already exists' message)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for sql in statements:
                try:
                    st.executeUpdate(sql)
                except Exception as e:
                    msg = str(e)
                    if ignore_existing and any(s in msg for s in _EXISTS_STATES):
                        continue
                    raise
        finally:
            st.close()
    finally:
        conn.close()


def graph_schema_ddl(
    url: str,
    links_table: str = "hawk_graph_links",
    entry_table: str = "hawk_graph_entry",
    schema: str | None = None,
) -> list[str]:
    """The DDL `ensure_graph_schema_jdbc` executes, as statement text —
    separated out so the Postgres dialect can be executed/pinned against
    a real server without a JDBC driver jar (tests/test_pg_dialect_live).

    Postgres columns are jsonb (the reference migration's types);
    ``schema`` prefixes a namespace, mirroring graph_pg.rs's
    per-connection `SET search_path` schema switch (:130-139) — two
    graphs under different schemas share a database without collision."""
    pg = _dialect(url) == "postgresql"
    link_cols = _PG_LINK_TYPES if pg else _DERBY_LINK_TYPES
    entry_cols = _PG_ENTRY_TYPES if pg else _DERBY_ENTRY_TYPES
    prefix = "CREATE TABLE IF NOT EXISTS" if pg else "CREATE TABLE"
    stmts = []
    if schema:
        stmts.append(
            f"CREATE SCHEMA IF NOT EXISTS {schema}" if pg
            else f"CREATE SCHEMA {schema}"
        )
    stmts += [
        f"{prefix} {_qualified(schema, links_table)} ({link_cols}, "
        f"PRIMARY KEY (source_ref, layer))",
        f"{prefix} {_qualified(schema, entry_table)} ({entry_cols}, "
        f"PRIMARY KEY (id))",
    ]
    return stmts


def ensure_graph_schema_jdbc(
    spark: SparkSession,
    url: str | None = None,
    driver: str | None = None,
    links_table: str = "hawk_graph_links",
    entry_table: str = "hawk_graph_entry",
    schema: str | None = None,
) -> bool:
    """Create the reference's two tables WITH their primary keys
    (migrations/20240909105321_init.up.sql: PRIMARY KEY (source_ref,
    layer) / PRIMARY KEY (id)) if absent — the PKs are what make the
    upsert's conflict target real. Idempotent: existing tables are left
    untouched (Derby has no IF NOT EXISTS, so the already-exists CREATE
    error — and only that error — is swallowed). ``schema`` isolates a
    namespace (reference: throwaway `hawk_test_<rand>` schemas,
    graph_pg.rs:159-214)."""
    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return False
    _exec_updates(
        spark, url, driver,
        graph_schema_ddl(url, links_table, entry_table, schema),
        ignore_existing=True,
    )
    return True


def _upsert_sql(url: str, target: str, stage: str, key_cols: list[str],
                val_cols: list[str], jsonb: bool = False) -> str:
    # Spark's JDBC writer creates the staging table with QUOTED column
    # names (case-sensitive lowercase); the target tables use the
    # database's unquoted normalization — so staging references are
    # quoted, target references are not.
    def q(c: str) -> str:
        return f'"{c}"'

    keys = ", ".join(key_cols)
    cols = ", ".join(key_cols + val_cols)
    if _dialect(url) == "postgresql":
        # jsonb=True targets a reference-migrated schema (init.up.sql
        # declares links/entry_point as jsonb): the staged TEXT needs an
        # explicit cast in both the SELECT and the conflict update.
        sel = ", ".join(
            [q(c) for c in key_cols]
            + [f"CAST({q(c)} AS jsonb)" if jsonb else q(c) for c in val_cols]
        )
        sets = ", ".join(f"{c} = EXCLUDED.{c}" for c in val_cols)
        return (
            f"INSERT INTO {target} ({cols}) SELECT {sel} FROM {stage} "
            f"ON CONFLICT ({keys}) DO UPDATE SET {sets}"
        )
    on = " AND ".join(f"t.{c} = s.{q(c)}" for c in key_cols)
    sets = ", ".join(f"t.{c} = s.{q(c)}" for c in val_cols)
    vals = ", ".join(f"s.{q(c)}" for c in key_cols + val_cols)
    return (
        f"MERGE INTO {target} t USING {stage} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def upsert_graph_jdbc(
    links: DataFrame,
    entries: DataFrame,
    url: str | None = None,
    driver: str | None = None,
    links_table: str = "hawk_graph_links",
    entry_table: str = "hawk_graph_entry",
    jsonb: bool | None = None,
    schema: str | None = None,
) -> bool:
    """Merge a DELTA of graph rows into the live tables with the
    reference's upsert semantics (graph_pg.rs:111-115 `ON CONFLICT
    (source_ref, layer) DO UPDATE SET links = EXCLUDED.links`; :69-80
    for the entry row): rows already present are UPDATED in place, new
    rows INSERT, rows absent from the delta are left untouched — the
    incremental persistence shape for insert/delete/repair cycles.

    ``links``/``entries`` are the normalized views (`hnsw.to_links` /
    `hnsw.entry_points`), possibly filtered to touched rows only. The
    delta stages through Spark's JDBC writer (distributed), then one
    driver-side dialect statement (Postgres `ON CONFLICT`, standard-SQL
    `MERGE` elsewhere — Derby in tests) moves stage → target. Links JSON
    above ~32 KB needs the Postgres dialect (Derby staging uses
    VARCHAR(32000) so the MERGE join can compare keys; CLOBs can't).
    ``jsonb`` (stage TEXT → target jsonb cast) defaults to
    AUTODETECTION on the Postgres dialect: the live links-column type
    is read from information_schema, so helper-created tables (jsonb,
    matching the reference migration) get the cast and LEGACY tables
    created by a pre-jsonb release (TEXT columns) keep their bytes
    EXACT — measured on PG 15, casting into a TEXT target does not
    error (I/O-conversion assignment) but silently rewrites rows
    through jsonb normalization, breaking byte-level consumers
    (ADVICE r6 #2; tests/test_pg_dialect_live.py pins both). Pass
    ``jsonb=True/False`` to pin the behavior; migrate a legacy table
    with ``ALTER TABLE ... ALTER COLUMN links TYPE jsonb USING
    links::jsonb``. Stage tables carry a unique per-call suffix and
    are dropped in a finally, so concurrent writers against the same
    database never clobber each other's staging data and a failed MERGE
    doesn't leak stage tables (ADVICE r5). ``schema`` namespaces both
    targets and stages. Returns False (no-op) when no JDBC URL is
    configured."""
    import uuid

    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return False
    spark = links.sparkSession
    ensure_graph_schema_jdbc(spark, url, driver, links_table, entry_table,
                             schema=schema)
    links_rows, entry_rows = to_pg_rows(links, entries)
    pg = _dialect(url) == "postgresql"
    if jsonb is None:
        if pg:
            try:
                t = _query_scalar(
                    spark, url, driver, _pg_links_type_sql(links_table, schema)
                )
            except Exception:
                t = None  # probe failure: fall back to the jsonb default
            # freshly-ensured tables are jsonb; an existing non-jsonb
            # column means a legacy (pre-jsonb) database -> no cast
            jsonb = (t is None) or (t == "jsonb")
        else:
            jsonb = False
    tok = uuid.uuid4().hex[:8]
    stage_l = _qualified(schema, f"{links_table}_stage_{tok}")
    stage_e = _qualified(schema, f"{entry_table}_stage_{tok}")
    target_l = _qualified(schema, links_table)
    target_e = _qualified(schema, entry_table)

    def stage(rows: DataFrame, table: str, col_types: str) -> None:
        w = (
            rows.write.format("jdbc").option("url", url)
            .option("dbtable", table)
            .option("createTableColumnTypes", col_types)
        )
        if driver:
            w = w.option("driver", driver)
        w.mode("overwrite").save()

    try:
        stage(links_rows, stage_l,
              _PG_LINK_STAGE_TYPES if pg else _DERBY_LINK_TYPES)
        stage(entry_rows, stage_e,
              _PG_ENTRY_STAGE_TYPES if pg else _DERBY_ENTRY_TYPES)
        _exec_updates(
            spark, url, driver,
            [
                _upsert_sql(url, target_l, stage_l,
                            ["source_ref", "layer"], ["links"], jsonb=jsonb),
                _upsert_sql(url, target_e, stage_e, ["id"], ["entry_point"],
                            jsonb=jsonb),
            ],
        )
    finally:
        try:
            _exec_updates(
                spark, url, driver,
                [f"DROP TABLE {stage_l}", f"DROP TABLE {stage_e}"],
            )
        except Exception:  # stage may not exist if staging itself failed
            pass
    return True


def import_graph_jdbc(
    spark: SparkSession,
    url: str | None = None,
    driver: str | None = None,
    links_table: str = "hawk_graph_links",
    entry_table: str = "hawk_graph_entry",
    schema: str | None = None,
) -> tuple[DataFrame, DataFrame] | None:
    """Inverse of `export_graph_jdbc`: read the two Postgres-layout
    tables back and parse into the normalized (links, entries) views.
    Returns None when no JDBC URL is configured."""
    url = url or os.environ.get("HAWK_PACK_JDBC_URL")
    if not url:
        return None

    def read(table: str) -> DataFrame:
        r = (
            spark.read.format("jdbc").option("url", url)
            .option("dbtable", _qualified(schema, table))
        )
        if driver:
            r = r.option("driver", driver)
        return r.load()

    return from_pg_rows(read(links_table), read(entry_table))


# ---------------------------------------------------------------------------
# Serving manifest: the restartable deployment unit.
#
# `save_index` persists only the graph rows; a serving process restarted
# from it must recompute routing centroids with an O(n) scan and must be
# told the build params out-of-band. The manifest closes both gaps — one
# directory carries everything `search_serving`/`ann_search` needs:
#
#   <path>/graph/      shard-partitioned parquet (partition pruning on
#                      `shard IN (probed…)` — per-query I/O tracks nprobe)
#   <path>/centroids/  num_shards rows of build-time routing metadata
#   <path>/meta/       1 row: metric + HawkParams as JSON
#
# Reference analog: GraphPg persists the graph but HawkerParams travel in
# code (hawk_searcher.rs:34-76); at cluster scale the params ARE state —
# a mismatched ef/M schedule silently degrades recall, so they ship with
# the index.


class ServingIndex:
    """What `load_serving_index` returns — the bundle a serving process
    holds: the (optionally materialized) index DataFrame, collected
    centroid rows, and the build-time params/metric."""

    __slots__ = ("index", "centroids", "params", "metric", "num_shards")

    def __init__(self, index, centroids, params, metric, num_shards):
        self.index = index
        self.centroids = centroids
        self.params = params
        self.metric = metric
        self.num_shards = num_shards


def save_serving_index(
    index_df: DataFrame,
    path: str,
    centroids: list | None = None,
    params=None,
    metric: str = "l2_sq",
) -> None:
    """Persist graph + routing centroids + params as one serving unit.

    `centroids` defaults to one `shard_centroids` scan — at save time the
    index is in memory and the scan is amortized over every future
    restart (a reload never pays it again)."""
    import dataclasses
    import json

    from hawk_pack_spark.operators.hnsw import shard_centroids

    spark = index_df.sparkSession
    save_index(index_df, os.path.join(path, "graph"))
    payload = "c_code" if metric == "hamming" else "c_vec"
    if centroids is None:
        cent_df = shard_centroids(index_df, metric)
    else:
        schema = (
            "shard int, c_code long" if metric == "hamming"
            else "shard int, c_vec array<double>"
        )
        cent_df = spark.createDataFrame(
            [(int(r[0]), r[1]) for r in centroids], schema
        )
    cent_df.select("shard", payload).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "centroids"))
    meta = {
        "metric": metric,
        "params": dataclasses.asdict(params) if params is not None else None,
    }
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def load_serving_index(
    spark: SparkSession, path: str, materialize: bool = False
) -> ServingIndex:
    """Reload a serving unit saved by `save_serving_index`.

    materialize=False (default) keeps the index lazy on disk — the
    serving path's `shard IN (probed…)` filter reaches the scan as a
    PartitionFilter, so per-query I/O tracks nprobe, not index size.
    materialize=True repartitions whole-shards-per-partition and pins the
    index in cluster memory (localCheckpoint) — the long-lived serving
    process shape, paying one load-time shuffle for zero per-query I/O."""
    import json

    from hawk_pack_spark.config import HawkParams

    index = load_index(spark, os.path.join(path, "graph"))
    cent_rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("shard")
        .collect()
    )
    meta = json.loads(
        spark.read.parquet(os.path.join(path, "meta")).collect()[0][0]
    )
    pd_ = meta.get("params")
    params = None
    if pd_ is not None:
        params = HawkParams(
            **{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in pd_.items()
            }
        )
    num_shards = len(cent_rows)
    if materialize:
        index = index.repartition(max(num_shards, 1), "shard").localCheckpoint()
        index.count()
    return ServingIndex(index, cent_rows, params, meta["metric"], num_shards)


# ---------------------------------------------------------------------------
# IVF-family serving manifest (IVF-PQ / IVF-SQ8)
#
# The restartable unit for the cell-pruned compressed indexes, parallel
# to the HNSW `save_serving_index` bundle:
#   <path>/codes/  cell-partitioned parquet — `cell IN (probed…)` reaches
#                  the scan as PartitionFilters, so per-query I/O tracks
#                  nprobe, not corpus size (the measured disk arm of
#                  tools/bench_ivfpq_scale.py)
#   <path>/meta/   1 row: kind + centers + quantizer model as JSON
#                  (codebooks ≤ m·k·(d/m) floats, lo/scale ≤ 2·d — driver
#                  metadata, exactly like the HNSW centroid side-car)


class IvfIndex:
    """What `load_ivf_index` returns — the serving bundle for an
    IVF-PQ or IVF-SQ8 index: the lazy cell-partitioned codes DataFrame
    plus the driver-side routing/quantizer model. `search` dispatches
    to the matching search function."""

    __slots__ = ("kind", "codes", "centers", "lo", "scale", "codebooks",
                 "cell_radii")

    def __init__(self, kind, codes, centers, lo=None, scale=None,
                 codebooks=None, cell_radii=None):
        self.kind = kind
        self.codes = codes
        self.centers = centers
        self.lo = lo
        self.scale = scale
        self.codebooks = codebooks
        # build-time covering radii (ivf_cell_stats) — carried for the
        # streaming drift signal and radius-query routing
        self.cell_radii = cell_radii

    def search(self, queries, k: int = 10, nprobe: int = 8, **kw):
        from hawk_pack_spark.operators.pq import ivfpq_search, ivfsq8_search

        if self.kind == "ivfpq":
            return ivfpq_search(
                self.codes, self.centers, self.codebooks, queries,
                kth=k, nprobe=nprobe, **kw,
            )
        return ivfsq8_search(
            self.codes, self.centers, self.lo, self.scale, queries,
            kth=k, nprobe=nprobe, **kw,
        )


def save_ivf_index(
    path: str,
    encoded: DataFrame,
    centers: list,
    kind: str,
    lo=None,
    scale=None,
    codebooks=None,
    cell_radii=None,
) -> None:
    """Persist an IVF-PQ (`kind="ivfpq"`, pass codebooks) or IVF-SQ8
    (`kind="ivfsq8"`, pass lo/scale) index as one serving unit. The
    codes table is written ``partitionBy("cell")`` — the pruned layout
    the search paths' probed-cell filter needs to hit PartitionFilters.
    """
    import json

    if kind not in ("ivfpq", "ivfsq8"):
        raise ValueError(f"unknown IVF index kind {kind!r}")
    if kind == "ivfpq" and codebooks is None:
        raise ValueError("ivfpq manifest needs codebooks")
    if kind == "ivfsq8" and (lo is None or scale is None):
        raise ValueError("ivfsq8 manifest needs lo and scale")
    spark = encoded.sparkSession
    encoded.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "codes")
    )
    meta = {
        "kind": kind,
        "centers": [[float(x) for x in c] for c in centers],
        "lo": None if lo is None else [float(x) for x in lo],
        "scale": None if scale is None else [float(x) for x in scale],
        "codebooks": None if codebooks is None else codebooks.tolist(),
        "cell_radii": (
            None if cell_radii is None else [float(x) for x in cell_radii]
        ),
    }
    spark.createDataFrame([(json.dumps(meta),)], "meta string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def load_ivf_index(spark: SparkSession, path: str) -> IvfIndex:
    """Reload an IVF serving unit saved by `save_ivf_index`. The codes
    DataFrame stays LAZY on disk — the probed-cell filter prunes
    partitions at scan time; only the routing/quantizer model (a few
    thousand floats) is collected to the driver."""
    import json

    import numpy as np

    meta = json.loads(
        spark.read.parquet(os.path.join(path, "meta")).collect()[0][0]
    )
    codes = spark.read.parquet(os.path.join(path, "codes"))
    lo = None if meta["lo"] is None else np.asarray(meta["lo"], dtype=np.float64)
    scale = (
        None if meta["scale"] is None
        else np.asarray(meta["scale"], dtype=np.float64)
    )
    codebooks = (
        None if meta["codebooks"] is None
        else np.asarray(meta["codebooks"], dtype=np.float64)
    )
    return IvfIndex(
        meta["kind"], codes, meta["centers"], lo, scale, codebooks,
        meta.get("cell_radii"),
    )
