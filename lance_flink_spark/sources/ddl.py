"""Flink-SQL-style DDL/DML surface over the warehouse catalog.

Parity with table/LanceDynamicTableFactory.java +
LanceDynamicTableSink.java and the reference's SQL demo
(src/test/resources/flink-sql-demo.sql):

    CREATE TABLE vectors (id BIGINT, content STRING,
                          embedding ARRAY<FLOAT>)
    WITH ('connector' = 'lance', 'path' = '...',
          'write.batch-size' = '1024', 'index.type' = 'IVF_PQ', ...)
    INSERT INTO vectors VALUES (1, 'Hello', ARRAY[0.1, 0.2]);
    SELECT * FROM vectors WHERE id > 0;

Everything after parsing is plain Spark: the table is a versioned
Dataset, SELECTs run through spark.sql on registered views (full
Catalyst pushdown), INSERTs append/overwrite dataset versions.
``ARRAY[...]`` literals are rewritten to Spark's ``array(...)``.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lance_flink_spark.sources import fsio
from lance_flink_spark.sources.catalog import Catalog, CatalogError
from lance_flink_spark.sources.dataset import Dataset, DatasetOptions

_CREATE_HEAD = re.compile(
    r"CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*\(",
    re.IGNORECASE,
)
_INSERT = re.compile(
    r"INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<name>[\w.]+)\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CTAS = re.compile(
    # Flink 1.17+ CTAS: CREATE TABLE t [WITH (...)] AS SELECT ... —
    # schema is derived from the query, data is written atomically as
    # the table's first version. Matched AFTER _CREATE_HEAD (which
    # requires an explicit column list) in execute().
    r"CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*"
    r"(?:WITH\s*\((?P<opts>[^)]*)\)\s*)?AS\s+(?P<select>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP = re.compile(
    r"DROP\s+TABLE\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_DB = re.compile(
    r"DROP\s+DATABASE\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>[\w.]+)"
    r"(?:\s+(?P<cascade>CASCADE|RESTRICT))?\s*$",
    re.IGNORECASE,
)
_DROP_CATALOG = re.compile(
    r"DROP\s+CATALOG\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>\w+)\s*$", re.IGNORECASE
)
_CREATE_FUNCTION = re.compile(
    r"CREATE\s+FUNCTION\s+(?P<name>\w+)\s+AS\s+'(?P<cls>[^']+)'\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+TO\s+(?P<new>[\w.]+)\s*$",
    re.IGNORECASE,
)
_ALTER_ADD = re.compile(
    # cols allows one paren nesting level so parameterized types —
    # DECIMAL(10,2), TIMESTAMP(3), VARCHAR(255) — parse instead of
    # silently falling through to spark.sql
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+(?:COLUMNS?\s+)?"
    r"\(?(?P<cols>(?:[^()]|\([^()]*\))+?)\)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_ADD_BACKFILL = re.compile(
    # ALTER TABLE t ADD COLUMN x <type> AS (<expr>) — or a COLUMNS
    # list mixing computed and plain columns — Lance's zero-rewrite
    # add_columns(transforms): compute the columns from the existing
    # ones, ONE new per-fragment data file, ONE commit, no rewrite
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+(?:COLUMNS?\s+)?"
    r"(?P<body>.*\bAS\s*\(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_BACKFILL_ITEM = re.compile(
    r"(?P<col>\w+)\s+(?P<type>\w+(?:\([^)]*\))?(?:\s*<[^>]*>)?)"
    r"(?:\s+AS\s*\((?P<expr>.+)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _strip_outer_parens(s: str) -> str:
    """Remove ONE wrapping paren pair iff the opening paren's match is
    the final character (so `(a AS (x)), b` is left alone)."""
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        return s
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:-1].strip() if i == len(s) - 1 else s
    return s


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside paren nesting — column lists whose
    items carry parenthesized expressions or parameterized types.
    Angle brackets are NOT tracked: `<`/`>` are comparison operators
    inside backfill expressions (`a > b` would corrupt the depth), and
    the subset's generic types (ARRAY<FLOAT>) carry no top-level
    commas."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]
_ALTER_CAST_COL = re.compile(
    # ALTER TABLE t ALTER COLUMN x [SET DATA] TYPE <t> — Lance's
    # alter_columns(cast): column-scoped rewrite, one commit
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ALTER\s+COLUMN\s+"
    r"(?P<col>\w+)\s+(?:SET\s+DATA\s+)?TYPE\s+"
    r"(?P<type>\w+(?:\([^)]*\))?(?:\s*<[^>]*>)?)\s*$",
    re.IGNORECASE,
)
_ALTER_RENAME_COL = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>\w+)\s+TO\s+(?P<new>\w+)\s*$",
    re.IGNORECASE,
)
_ALTER_MERGE_COLUMNS = re.compile(
    # ALTER TABLE t MERGE COLUMNS (<query>) ON <key> — Lance's
    # Dataset.merge: attach the query's non-key columns by key join,
    # zero-rewrite (one new per-fragment data file)
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+MERGE\s+COLUMNS\s*"
    r"\((?P<q>.+)\)\s*ON\s+(?P<on>\w+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+(?:COLUMNS?\s+)?"
    r"\(?(?P<cols>[\w\s,]+?)\)?\s*$",
    re.IGNORECASE,
)
_TIME_TRAVEL = re.compile(
    # SELECT-side time travel: `t VERSION AS OF 3` (Delta/Spark
    # spelling) or `t FOR SYSTEM_TIME AS OF 3` (Flink temporal
    # spelling, with the manifest version as the time attribute)
    r"(?P<tbl>[A-Za-z_]\w*)\s+(?:VERSION\s+AS\s+OF\s+(?P<v1>\d+)"
    r"|FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<v2>\d+))",
    re.IGNORECASE,
)
_WINDOW_TVF = re.compile(
    # Flink windowing TVFs (1.13+ SQL): TABLE(TUMBLE(TABLE t,
    # DESCRIPTOR(ts), INTERVAL '1' HOUR)) and HOP(..., slide, size) —
    # rewritten to Spark's window() expression with the TVF's
    # window_start / window_end output columns
    r"TABLE\s*\(\s*(?P<kind>TUMBLE|HOP|CUMULATE)\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*"
    r"INTERVAL\s+'(?P<i1>[^']+)'\s+(?P<u1>\w+)"
    r"(?:\s*,\s*INTERVAL\s+'(?P<i2>[^']+)'\s+(?P<u2>\w+))?\s*\)\s*\)",
    re.IGNORECASE,
)
_MERGE_WHEN = re.compile(
    # Delta-style conditional MERGE: WHEN [NOT] MATCHED [AND cond]
    # THEN UPDATE SET ... / DELETE / INSERT *
    r"MERGE\s+INTO\s+(?P<name>[\w.]+)\s+USING\s+\((?P<src>.+)\)\s+"
    r"ON\s+(?P<on>\w+)\s+(?P<clauses>WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_CLAUSE = re.compile(
    r"WHEN\s+(?P<not_>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?:UPDATE\s+SET\s+(?P<sets>.+?)|(?P<delete>DELETE)|(?P<insert>INSERT(?:\s+\*)?))"
    r"(?=\s+WHEN\s|\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_ADD_CONSTRAINT = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+CONSTRAINT\s+(?P<cname>\w+)\s+"
    r"CHECK\s*\((?P<expr>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONSTRAINT = re.compile(
    r"ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+CONSTRAINT\s+(?P<cname>\w+)\s*$",
    re.IGNORECASE,
)
_META_TABLE = re.compile(
    # Iceberg-style metadata tables: SELECT ... FROM t$files / t$history
    r"(?P<tbl>[\w.]+)\$(?P<kind>files|history|deletes)\b"
)
_SHOW_INDEXES = re.compile(
    r"SHOW\s+INDEXES\s+(?:FROM|IN|ON)\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_DROP_INDEX = re.compile(
    r"DROP\s+INDEX\s+ON\s+(?P<name>[\w.]+)\s*\(\s*(?P<col>\w+)\s*\)"
    r"(?:\s+USING\s+(?P<using>\w+))?\s*$",
    re.IGNORECASE,
)
_COPY_INTO = re.compile(
    # Delta-style bulk ingestion: COPY INTO t FROM 'path'
    # FILEFORMAT = PARQUET|CSV|JSON [WITH ('header'='true', ...)]
    r"COPY\s+INTO\s+(?P<name>[\w.]+)\s+FROM\s+'(?P<src>[^']+)'\s+"
    r"FILEFORMAT\s*=\s*(?P<fmt>PARQUET|CSV|JSON)"
    r"(?:\s+WITH\s*\((?P<opts>[^)]*)\))?\s*$",
    re.IGNORECASE,
)
_VECTOR_SEARCH = re.compile(
    # the reference's LanceVectorSearchFunction SQL surface
    # (flink-sql-demo.sql:229-238): SELECT * FROM vector_search(
    #   'table_or_path', 'embedding', ARRAY[0.1, ...], 10 [, 'L2'])
    r"SELECT\s+\*\s+FROM\s+vector_search\s*\(\s*"
    r"'(?P<tbl>[^']+)'\s*,\s*'(?P<col>\w+)'\s*,\s*"
    r"ARRAY\s*\[(?P<vec>[^\]]+)\]\s*,\s*(?P<k>\d+)"
    r"(?:\s*,\s*'(?P<metric>\w+)')?"
    r"(?:\s*,\s*'(?P<filter>[^']+)')?\s*\)\s*$",
    re.IGNORECASE,
)
_CREATE_INDEX = re.compile(
    # CREATE INDEX ON t (col) [USING SCALAR|BLOOM|IVF_FLAT|IVF_PQ|
    # IVF_SQ|IVF_HNSW] [WITH ('index.num-partitions'='8', ...)] —
    # SQL surface over the option-driven builders (the reference's
    # LanceIndexBuilder consumes the same index.*/vector.* strings)
    r"CREATE\s+INDEX\s+ON\s+(?P<name>[\w.]+)\s*\(\s*(?P<col>\w+)\s*\)"
    r"(?:\s+USING\s+(?P<using>\w+))?"
    r"(?:\s+WITH\s*\((?P<opts>[^)]*)\))?\s*$",
    re.IGNORECASE,
)
_SESSION_TVF = re.compile(
    # Flink 1.17 SESSION windowing TVF: TABLE(SESSION(TABLE t
    # [PARTITION BY k1, k2], DESCRIPTOR(ts), INTERVAL '5' MINUTES))
    r"TABLE\s*\(\s*SESSION\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)"
    r"(?:\s+PARTITION\s+BY\s+(?P<keys>\w+(?:\s*,\s*\w+)*))?\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<ts>\w+)\s*\)\s*,\s*"
    r"INTERVAL\s+'(?P<g>[^']+)'\s+(?P<u>\w+)\s*\)\s*\)",
    re.IGNORECASE,
)
_CREATE_MV = re.compile(
    # the self-maintainable aggregate shape (SUM/COUNT under
    # retraction): SELECT g1[, g2...], SUM(v) [AS a] FROM t GROUP BY ...
    # 'key' in WITH(...) names the source's row identity for the CDF
    r"CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.]+)\s*"
    r"(?:WITH\s*\((?P<opts>[^)]*)\)\s*)?AS\s+"
    r"SELECT\s+(?P<grps>[\w\s,]+?)\s*,\s*SUM\s*\((?P<val>\w+)\)(?:\s+AS\s+\w+)?\s+"
    r"FROM\s+(?P<src>[\w.]+)\s+GROUP\s+BY\s+[\w\s,]+\s*$",
    re.IGNORECASE | re.DOTALL,
)
_REFRESH_MV = re.compile(
    r"REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_DROP_MV = re.compile(
    r"DROP\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_DELETE = re.compile(
    r"DELETE\s+FROM\s+(?P<name>[\w.]+)(?:\s+WHERE\s+(?P<pred>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SHOW_TABLES = re.compile(
    r"SHOW\s+TABLES(?:\s+(?:FROM|IN)\s+(?P<db>[\w.]+))?\s*$", re.IGNORECASE
)
_SHOW_DBS = re.compile(r"SHOW\s+DATABASES\s*$", re.IGNORECASE)
_SHOW_CATALOGS = re.compile(r"SHOW\s+CATALOGS\s*$", re.IGNORECASE)
_SHOW_VIEWS = re.compile(r"SHOW\s+VIEWS\s*$", re.IGNORECASE)
_SHOW_FUNCTIONS = re.compile(r"SHOW\s+(?:USER\s+)?FUNCTIONS\s*$", re.IGNORECASE)
_EXPLAIN = re.compile(r"EXPLAIN\s+(?:PLAN\s+FOR\s+)?(?P<stmt>.+)$",
                      re.IGNORECASE | re.DOTALL)
# Flink SQL-client SET surface: SET 'key' = 'value' / SET / RESET 'key'
_SET_QUOTED = re.compile(
    r"SET\s+'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'\s*$", re.IGNORECASE
)
_RESET_QUOTED = re.compile(r"RESET\s+'(?P<k>[^']+)'\s*$", re.IGNORECASE)
_TRUNCATE = re.compile(r"TRUNCATE\s+TABLE\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE)
_CREATE_VIEW = re.compile(
    # Flink CREATE [TEMPORARY] VIEW v AS SELECT ... — logical views:
    # the SELECT is re-expanded whenever a base table changes, so a
    # view over a catalog table sees later INSERTs (Flink semantics,
    # NOT a snapshot). Non-TEMPORARY views are CATALOG objects: the
    # SELECT text persists in warehouse metadata and re-expands in any
    # later engine over the same warehouse.
    r"CREATE\s+(?P<temp>TEMPORARY\s+)?VIEW\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?"
    r"(?P<name>[\w.]+)\s+AS\s+(?P<select>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_VIEW = re.compile(
    r"DROP\s+(?:TEMPORARY\s+)?VIEW\s+(?:(?P<ie>IF\s+EXISTS)\s+)?"
    r"(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)
_STATEMENT_SET = re.compile(
    # Flink EXECUTE STATEMENT SET BEGIN <stmt>; [<stmt>;]... END —
    # multiple INSERTs planned as one job. Spark has no multi-sink
    # jobs; we run the statements sequentially (same visible effect;
    # the reference's atomicity unit is per-Lance-commit anyway).
    r"EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(?P<body>.+?)\s*;?\s*END\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_CATALOG = re.compile(
    # reference demo (flink-sql-demo.sql:118): CREATE CATALOG name
    # WITH ('type'='lance', 'warehouse'=..., 'default-database'=...,
    # 's3-access-key'=..., ...) — LanceCatalogFactory's option keys
    r"CREATE\s+CATALOG\s+(?P<name>\w+)\s+WITH\s*\((?P<opts>[^)]*)\)\s*$",
    re.IGNORECASE,
)
_USE_CATALOG = re.compile(r"USE\s+CATALOG\s+(?P<name>\w+)\s*$", re.IGNORECASE)
_USE_DB = re.compile(r"USE\s+(?!CATALOG\b)(?P<name>\w+)\s*$", re.IGNORECASE)
# LanceCatalogFactory.java:77-108 → Hadoop s3a configuration
_S3_KEY_MAP = {
    "s3-access-key": ("fs.s3a.access.key", None),
    "s3-secret-key": ("fs.s3a.secret.key", None),
    "s3-region": ("fs.s3a.endpoint.region", None),
    "s3-endpoint": ("fs.s3a.endpoint", None),
    # reference default TRUE; s3a expresses it inverted (path-style)
    "s3-virtual-hosted-style": ("fs.s3a.path.style.access", "invert"),
    # reference default FALSE; s3a expresses it as ssl-enabled
    "s3-allow-http": ("fs.s3a.connection.ssl.enabled", "invert"),
}
_CREATE_DB = re.compile(
    r"CREATE\s+DATABASE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)
_DESCRIBE = re.compile(
    r"(?:DESCRIBE|DESC)\s+(?P<ext>EXTENDED\s+)?(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_ANALYZE = re.compile(
    r"ANALYZE\s+TABLE\s+(?P<name>[\w.]+)\s+COMPUTE\s+STATISTICS"
    r"(?P<cols>\s+FOR\s+ALL\s+COLUMNS)?\s*$",
    re.IGNORECASE,
)
_OPTIMIZE = re.compile(
    r"OPTIMIZE\s+(?P<name>[\w.]+)"
    r"(?:\s+ZORDER\s+BY\s+\((?P<cols>[^)]+)\)|\s+(?P<binpack>BINPACK)"
    r"|\s+(?P<indexes>INDEXES))?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"VACUUM\s+(?P<name>[\w.]+)(?:\s+KEEP\s+(?P<keep>\d+))?\s*$", re.IGNORECASE
)
_RESTORE = re.compile(
    r"RESTORE\s+TABLE\s+(?P<name>[\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)\s*$",
    re.IGNORECASE,
)
_SHOW_CREATE = re.compile(
    r"SHOW\s+CREATE\s+TABLE\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
_TABLE_CHANGES = re.compile(
    # Delta's table_changes TVF: SELECT * FROM table_changes('t', 2[, 5])
    r"SELECT\s+\*\s+FROM\s+table_changes\s*\(\s*'(?P<tbl>[^']+)'\s*,\s*"
    r"(?P<frm>\d+)(?:\s*,\s*(?P<to>\d+))?\s*\)\s*$",
    re.IGNORECASE,
)
_FIM_TVF = re.compile(
    # training-transform TVF: the PSM fill-in-middle rearrangement as
    # a table function (functions.text.fim_rearrange) — SELECT * FROM
    # fim_transform('t', 'id_col', 'text_col')
    r"SELECT\s+\*\s+FROM\s+fim_transform\s*\(\s*'(?P<tbl>[^']+)'\s*,\s*"
    r"'(?P<id>[^']+)'\s*,\s*'(?P<txt>[^']+)'\s*\)\s*$",
    re.IGNORECASE,
)
_PHASH_TVF = re.compile(
    # perceptual-hash TVF over a binary media column — SELECT * FROM
    # perceptual_hash('t', 'content_col', 'id_col'[, 'image'|'audio'])
    r"SELECT\s+\*\s+FROM\s+perceptual_hash\s*\(\s*'(?P<tbl>[^']+)'\s*,\s*"
    r"'(?P<col>[^']+)'\s*,\s*'(?P<id>[^']+)'"
    r"(?:\s*,\s*'(?P<mode>image|audio)')?\s*\)\s*$",
    re.IGNORECASE,
)
# Flink event-time temporal table join (docs "Temporal Joins"):
#   SELECT ... FROM fact f JOIN dim FOR SYSTEM_TIME AS OF f.ts AS d
#   ON f.k = d.k [...]
# The AS OF operand is a column reference — the versioned variant with
# a NUMBER literal is _TIME_TRAVEL's case and never reaches this.
_TEMPORAL_JOIN = re.compile(
    r"^(?P<head>SELECT\s+.+?)\s+FROM\s+(?P<fact>[\w.]+)(?:\s+AS)?\s+(?P<fa>\w+)\s+"
    r"JOIN\s+(?P<dim>[\w.]+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P=fa)\.(?P<ts>\w+)"
    r"(?:\s+AS)?\s+(?P<da>\w+)\s+ON\s+(?P=fa)\.(?P<lk>\w+)\s*=\s*(?P=da)\.(?P<rk>\w+)"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)
_SHOW_VERSIONS = re.compile(
    r"SHOW\s+VERSIONS\s+(?:FROM|IN)\s+(?P<name>[\w.]+)\s*$", re.IGNORECASE
)
# Flink MATCH_RECOGNIZE (docs "Pattern Recognition"), restricted to the
# dialect subset that lowers onto operators/cep.py::match_sequence:
# plain single-occurrence pattern variables, DEFINE conjuncts of the
# form `V AS V.<col> = '<literal>'` (all on one column), AFTER MATCH
# SKIP TO NEXT ROW (the operator's every-start-row semantics), and
# MEASURES projecting a variable's <ts-col> (emitted as epoch micros)
# or the first variable's id column.
_MATCH_RECOGNIZE = re.compile(
    r"^SELECT\s+\*\s+FROM\s+(?P<tbl>[\w.]+)\s+MATCH_RECOGNIZE\s*\(\s*"
    r"PARTITION\s+BY\s+(?P<key>\w+)\s+"
    r"ORDER\s+BY\s+(?P<ts>\w+)(?:\s+ASC)?\s+"
    r"(?:MEASURES\s+(?P<measures>.+?)\s+)?"
    r"(?:(?P<allrows>ALL\s+ROWS\s+PER\s+MATCH)\s+|ONE\s+ROW\s+PER\s+MATCH\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?:TO\s+NEXT\s+ROW|"
    r"(?P<pastlast>PAST\s+LAST\s+ROW))\s+)?"
    r"PATTERN\s*\(\s*(?P<pat>[\w\s+*]+?)\s*\)\s*"
    r"(?:WITHIN\s+INTERVAL\s+'(?P<wn>\d+)'\s+(?P<wu>\w+)\s*)?"
    r"DEFINE\s+(?P<defs>.+?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MR_DEFINE = re.compile(
    r"^(?P<var>\w+)\s+AS\s+(?P=var)\.(?P<col>\w+)\s*=\s*'(?P<lit>[^']*)'\s*$",
    re.IGNORECASE,
)
_MR_MEASURE = re.compile(
    r"^(?:FIRST\s*\(\s*)?(?P<var>\w+)\.(?P<col>\w+)\)?\s+AS\s+(?P<alias>\w+)\s*$",
    re.IGNORECASE,
)
_MERGE = re.compile(
    r"MERGE\s+INTO\s+(?P<name>[\w.]+)\s+USING\s+\((?P<src>.+)\)\s+ON\s+(?P<on>\w+)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE = re.compile(
    r"UPDATE\s+(?P<name>[\w.]+)\s+SET\s+(?P<sets>.+?)(?:\s+WHERE\s+(?P<pred>.+))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _rewrite_array_literals(sql: str) -> str:
    """Flink `ARRAY[0.1, 0.2]` → Spark `array(0.1, 0.2)`.

    Single scan tracking (a) string-literal state, so brackets inside
    '...' are never touched and a quoted ARRAY[ never triggers, and
    (b) a word boundary before the ARRAY keyword, so element access on
    identifiers ending in "array" (my_array[1]) is left alone. Array
    literals may nest; each rewritten '[' flips its matching ']'."""
    chars = list(sql)
    stack: list[bool] = []  # True = bracket opened by an array literal
    in_str = False
    i, n = 0, len(chars)
    while i < n:
        ch = chars[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and chars[i + 1] == "'":  # escaped ''
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
        elif ch == "[":
            j = i - 1
            while j >= 0 and chars[j] in " \t\r\n":
                j -= 1
            word = "".join(chars[max(0, j - 4) : j + 1]).lower()
            before = chars[j - 5] if j >= 5 else " "
            is_array = word == "array" and not (before.isalnum() or before == "_")
            if is_array:
                chars[i] = "("
                for p in range(j - 4, j + 1):
                    chars[p] = chars[p].lower()
            stack.append(is_array)
        elif ch == "]" and stack:
            if stack.pop():
                chars[i] = ")"
        i += 1
    return "".join(chars)


def _rewrite_window_tvfs(sql: str) -> str:
    """Flink windowing TVFs → Spark ``window()`` subqueries.

    ``TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' HOUR))``
    becomes a derived table exposing every source column plus the
    TVF's ``window_start`` / ``window_end`` — so the surrounding
    Flink-style ``GROUP BY window_start, window_end, ...`` runs
    unchanged. HOP's (slide, size) argument order follows Flink:
    the first interval is the slide, the second the size (Spark's
    window() takes them reversed)."""

    def sub(m: re.Match) -> str:
        tbl, ts = m.group("tbl"), m.group("ts")
        kind = m.group("kind").upper()
        d1 = f"{m.group('i1')} {m.group('u1')}"
        if kind == "CUMULATE":
            # no native Spark operator: fan each row out to the
            # cumulative windows whose end it precedes (Flink slice
            # assignment), ends generated inline
            from lance_flink_spark.streaming.windows import _interval_seconds

            if not m.group("i2"):
                raise ValueError("CUMULATE requires step and size intervals")
            step = _interval_seconds(d1)
            size = _interval_seconds(f"{m.group('i2')} {m.group('u2')}")
            if size % step:
                raise ValueError("CUMULATE size must be a multiple of step")
            k = size // step
            base = f"floor(unix_timestamp({ts}) / {size}) * {size}"
            return (
                f"(SELECT * EXCEPT (__e), to_timestamp({base}) AS window_start, "
                f"to_timestamp(__e) AS window_end "
                f"FROM (SELECT *, explode(filter(transform(sequence(1, {k}), "
                f"i -> {base} + i * {step}), "
                f"e -> unix_timestamp({ts}) < e)) AS __e FROM {tbl}))"
            )
        if kind == "TUMBLE":
            win = f"window({ts}, '{d1}')"
        else:
            if not m.group("i2"):
                raise ValueError("HOP requires slide and size intervals")
            size = f"{m.group('i2')} {m.group('u2')}"
            win = f"window({ts}, '{size}', '{d1}')"
        return (
            f"(SELECT * EXCEPT (__w), __w.start AS window_start, "
            f"__w.end AS window_end "
            f"FROM (SELECT *, {win} AS __w FROM {tbl}))"
        )

    def sub_session(m: re.Match) -> str:
        # Spark's session_window only exists as a groupBy expression
        # (windows merge during aggregation), so the TVF's per-row
        # window_start/window_end come from the relational dual: a
        # gap-break running sum assigns session ids, min/max over the
        # session give the bounds (end = last ts + gap, Flink's
        # definition). Exact integer microseconds throughout.
        from lance_flink_spark.streaming.windows import _interval_seconds

        tbl, ts = m.group("tbl"), m.group("ts")
        gap_us = _interval_seconds(f"{m.group('g')} {m.group('u')}") * 1_000_000
        keys = [k.strip() for k in (m.group("keys") or "").split(",") if k.strip()]
        part = f"PARTITION BY {', '.join(keys)} " if keys else ""
        part_sid = f"PARTITION BY {', '.join(keys)}, __sid" if keys else "PARTITION BY __sid"
        return (
            f"(SELECT * EXCEPT (__tsu, __brk, __sid), "
            f"timestamp_micros(min(__tsu) OVER ({part_sid})) AS window_start, "
            f"timestamp_micros(max(__tsu) OVER ({part_sid}) + {gap_us}) AS window_end "
            f"FROM (SELECT *, SUM(__brk) OVER ({part}ORDER BY __tsu "
            f"ROWS UNBOUNDED PRECEDING) AS __sid "
            f"FROM (SELECT *, unix_micros({ts}) AS __tsu, "
            f"CASE WHEN unix_micros({ts}) - lag(unix_micros({ts})) "
            f"OVER ({part}ORDER BY unix_micros({ts})) > {gap_us} "
            f"THEN 1 ELSE 0 END AS __brk FROM {tbl})))"
        )

    return _SESSION_TVF.sub(sub_session, _WINDOW_TVF.sub(sub, sql))


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren-depth 0 outside string literals —
    SET clauses like ``name = concat(a, ','), val = 2`` must not split
    inside the call or the literal."""
    parts: list[str] = []
    depth = 0
    in_str = False
    start = 0
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p for p in (x.strip() for x in parts) if p]


def _strip_comments(cols: str) -> str:
    return re.sub(r"\s+COMMENT\s+'(?:[^']|'')*'", "", cols, flags=re.IGNORECASE)


def _balanced(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx. Column
    types carry their own parens — TIMESTAMP(3), DECIMAL(10,2) — so a
    non-greedy regex would truncate the column list at the first ')'."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(f"unbalanced parentheses in DDL near: {s[open_idx:open_idx+60]!r}")


def _parse_create(sql: str):
    """→ (name, if_not_exists, cols_str, opts_str) or None."""
    m = _CREATE_HEAD.match(sql)
    if not m:
        return None
    cols_open = m.end() - 1
    cols_close = _balanced(sql, cols_open)
    rest = sql[cols_close:].strip()
    wm = re.match(r"WITH\s*\(", rest, re.IGNORECASE)
    if not wm:
        raise ValueError("CREATE TABLE requires a WITH (...) options clause")
    opts_close = _balanced(rest, wm.end() - 1)
    return (
        m.group("name"),
        bool(m.group("ine")),
        sql[cols_open + 1 : cols_close - 1],
        rest[wm.end() : opts_close - 1],
    )


_PK_CLAUSE = re.compile(
    r",?\s*PRIMARY\s+KEY\s*\(\s*`?(?P<col>\w+)`?\s*\)\s*(?:NOT\s+ENFORCED)?",
    re.IGNORECASE,
)


def _extract_primary_key(cols: str) -> tuple[str, str | None]:
    """Split a Flink ``PRIMARY KEY (k) NOT ENFORCED`` table constraint
    out of the column list (single-column keys — the upsert-sink
    shape). Returns (columns-without-the-clause, key or None)."""
    m = _PK_CLAUSE.search(cols)
    if not m:
        return cols, None
    return cols[: m.start()] + cols[m.end() :], m.group("col")


def _spark_ddl_types(cols: str) -> str:
    """Flink type spellings Spark's DDL parser or DataFrame layer
    rejects → Spark forms: TIMESTAMP(3) → TIMESTAMP (precision is a
    display concern) and VARCHAR(n)/CHAR(n) → STRING (Flink's STRING
    is itself VARCHAR(MAX); Spark's Varchar/CharType are unusable in
    createDataFrame without preserveCharVarcharTypeInfo)."""
    cols = re.sub(r"\bTIMESTAMP\s*\(\s*\d+\s*\)", "TIMESTAMP", cols, flags=re.IGNORECASE)
    return re.sub(r"\b(?:VAR)?CHAR\s*\(\s*\d+\s*\)", "STRING", cols, flags=re.IGNORECASE)


# Streaming OVER lowering (round 14, VERDICT r13 #6): Flink runs
# `AGG(v) OVER (PARTITION BY k ORDER BY ts RANGE|ROWS ... PRECEDING
# AND CURRENT ROW)` on STREAMING tables through its
# RowTime{Range,Rows}BoundedPrecedingFunction; Spark SQL refuses
# non-time-window aggregation on streams, so the statement lowers onto
# streaming/over_agg.py's stateful operators instead.
_STREAM_OVER = re.compile(
    r"^SELECT\s+(?P<proj>.+?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+WINDOW\s+(?P<wname>\w+)\s+AS\s*\((?P<wspec>[^()]+)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OVER_ITEM = re.compile(
    r"^(?P<agg>COUNT|SUM|MIN|MAX|AVG|LAG)\s*\((?P<args>[^()]*)\)\s+OVER\s+"
    r"(?:(?P<wref>\w+)|\(\s*(?P<inline>[^()]+?)\s*\))\s+AS\s+(?P<alias>\w+)$",
    re.IGNORECASE | re.DOTALL,
)
_OVER_WSPEC = re.compile(
    r"^\s*PARTITION\s+BY\s+(?P<k>\w+)\s+ORDER\s+BY\s+(?P<ts>\w+)"
    r"(?:\s+(?P<frame>RANGE|ROWS)\s+BETWEEN\s+(?P<bound>.+?)\s+PRECEDING"
    r"\s+AND\s+CURRENT\s+ROW)?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OVER_INTERVAL = re.compile(
    r"^INTERVAL\s+'(?P<n>\d+)'\s+(?P<u>SECOND|MINUTE|HOUR|DAY)S?$",
    re.IGNORECASE,
)

_INTERVAL_MS = {
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}

# Native-table scan shortcuts (round 14). COUNT(*) answers from the
# manifest + deletion files alone — zero data pages (Lance answers
# counts from metadata the same way); a simple projection list prunes
# the distributed decode to the referenced columns (LanceInputFormat's
# projection pushdown — Catalyst can't push through mapInPandas).
_NATIVE_COUNT = re.compile(
    r"^SELECT\s+COUNT\(\s*\*\s*\)(?:\s+AS\s+(?P<alias>\w+))?\s+FROM\s+"
    r"(?P<tbl>\w+)(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?\s*$",
    re.IGNORECASE,
)
_NATIVE_SELECT = re.compile(
    r"^SELECT\s+(?P<proj>[A-Za-z_][\w\s,]*?)\s+FROM\s+(?P<tbl>\w+)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(s: str) -> list[str]:
    """Split a projection list on commas OUTSIDE parentheses."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


class SqlEngine:
    """Execute Flink-dialect DDL/DML against a Catalog + SparkSession."""

    def __init__(self, spark: SparkSession, catalog: Catalog, database: str = "default"):
        self.spark = spark
        self.catalog = catalog
        self.database = database
        self.options: dict[str, DatasetOptions] = {}
        # tables declared with a PRIMARY KEY: INSERT INTO upserts
        self.primary_keys: dict[str, str] = {}
        self.matviews: dict = {}
        # logical (non-materialized) views: name -> SELECT text, in
        # creation order (refresh re-expands them in this order so a
        # view-over-view sees its dependency's fresh plan first)
        self.views: dict[str, str] = {}
        # read-only tables backed by NATIVE Lance datasets (real
        # .lance files — sources/lance_native.py): declared with the
        # same WITH ('connector'='lance', 'path'=...) surface, detected
        # by the path's _versions/ layout; every mutating statement
        # refuses (writing the native format needs the Lance library)
        self.native_tables: dict[str, object] = {}
        self.catalogs: dict[str, Catalog] = {"default_catalog": catalog}
        # SHOW FUNCTIONS surface: built-ins + CREATE FUNCTION names
        self.functions: dict[str, str] = {"vector_search": "built-in"}
        # re-expand views persisted by earlier engines over this
        # warehouse (Flink: non-TEMPORARY views are catalog objects).
        # Base tables register first so the view plans resolve.
        persisted = catalog.list_views(database)
        if persisted:
            for t in catalog.list_tables(database):
                try:
                    catalog.register(spark, database, t, view=t)
                except Exception:  # noqa: BLE001 - corrupt table ≠ dead engine
                    pass
            self.views.update(persisted)
            self._refresh_views()

    def _create_catalog(self, m: re.Match) -> None:
        """CREATE CATALOG (LanceCatalogFactory parity): 'type' must be
        lance; 'warehouse' roots the catalog; 'default-database' seeds
        the database; the six s3-* keys (LanceCatalogFactory.java:
        77-108) translate to the Hadoop s3a configuration the JVM
        FileSystem actually reads — same keys, reference defaults
        (virtual-hosted-style=true, allow-http=false)."""
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts")))
        if opts.get("type", "lance") != "lance":
            raise ValueError(f"unsupported catalog type {opts.get('type')!r}")
        if "warehouse" not in opts:
            raise ValueError("CREATE CATALOG requires 'warehouse'")
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        for k, (hkey, mode) in _S3_KEY_MAP.items():
            if k in opts:
                v = opts[k]
                if mode == "invert":
                    v = str(str(v).lower() not in ("true", "1")).lower()
                hconf.set(hkey, v)
        cat = Catalog(
            opts["warehouse"],
            default_database=opts.get("default-database", "default"),
        )
        self.catalogs[m.group("name")] = cat
        return None

    def _register(self, name: str) -> None:
        self.catalog.register(self.spark, self.database, name, view=name)
        self._refresh_views()

    def _refresh_views(self) -> None:
        """Re-expand every logical view against the CURRENT base-table
        registrations. Spark temp views pin the analyzed plan at
        creation, so a view captured before an INSERT would keep
        scanning the pre-insert file set; Flink views are logical and
        always see the latest table. Plan-building only — no job runs.
        A view whose base was dropped is left stale (queries against
        it keep the last good plan; DROP VIEW removes it)."""
        for vname, select in self.views.items():
            try:
                self._query(select).createOrReplaceTempView(vname)
            except Exception:  # noqa: BLE001 - stale view, keep last plan
                pass

    def _query(self, sql: str) -> DataFrame:
        """Build the DataFrame for a SELECT through the same rewrite
        pipeline as execute()'s fallthrough (time travel, meta tables,
        window TVFs, array literals)."""
        return self.spark.sql(
            _rewrite_array_literals(
                _rewrite_window_tvfs(
                    self._rewrite_meta_tables(self._rewrite_time_travel(sql))
                )
            )
        )

    def _match_recognize(self, m: re.Match) -> DataFrame:
        """Lower Flink MATCH_RECOGNIZE onto the batch CEP operator
        (operators/cep.py::match_sequence — reverse-min chain binding,
        two window passes, no per-row Python). Dialect subset:

        - PATTERN of plain single-occurrence variables (``(A B C)``);
        - DEFINE conjuncts ``V AS V.<col> = '<literal>'``, all
          variables on the SAME column (the event-type dispatch shape);
        - AFTER MATCH SKIP TO NEXT ROW — the operator emits one match
          per completing start row, which IS that skip policy;
        - optional ``WITHIN INTERVAL 'n' UNIT`` (default 1 hour);
        - MEASURES limited to ``V.<order-col> AS a`` (bound step's
          timestamp, emitted as epoch micros) and ``FIRST_VAR.<col>
          AS a`` (the match's anchoring event id). No MEASURES →
          the operator's full output (key, start_event_id,
          t0_us..tN_us, duration_us).

        Anything outside the subset raises rather than silently
        mis-parsing."""
        from lance_flink_spark.operators.cep import match_sequence

        tbl = m.group("tbl")
        if self._in_catalog(tbl):
            self._register(tbl)
        key, ts = m.group("key"), m.group("ts")
        pat_tokens = m.group("pat").split()
        # per-POSITION (var, quant) pairs — a dict keyed by variable
        # would collapse a repeated variable (PATTERN (A+ B A)) to its
        # last occurrence's quantifier and silently drop the '+'
        pat_pairs = [
            (t.rstrip("+*"), t[len(t.rstrip("+*")) :]) for t in pat_tokens
        ]
        pat_vars = [v for v, _q in pat_pairs]
        defs: dict[str, tuple[str, str]] = {}
        for d in m.group("defs").split(","):
            dm = _MR_DEFINE.match(d.strip())
            if not dm:
                raise ValueError(
                    f"MATCH_RECOGNIZE: unsupported DEFINE {d.strip()!r} "
                    "(subset: V AS V.<col> = '<literal>')"
                )
            defs[dm.group("var").upper()] = (dm.group("col"), dm.group("lit"))
        missing = [v for v in pat_vars if v.upper() not in defs]
        if missing:
            raise ValueError(f"MATCH_RECOGNIZE: PATTERN vars without DEFINE: {missing}")
        type_cols = {defs[v.upper()][0] for v in pat_vars}
        if len(type_cols) != 1:
            raise ValueError(
                "MATCH_RECOGNIZE subset requires all DEFINE conjuncts on one "
                f"column, got {sorted(type_cols)}"
            )
        type_col = type_cols.pop()
        steps = [defs[v.upper()][1] for v in pat_vars]
        within = "1 hour"
        if m.group("wn"):
            within = f"{m.group('wn')} {m.group('wu').lower()}s".replace("ss", "s")
        quantified = any(q for _v, q in pat_pairs)
        if quantified or m.group("pastlast") or m.group("allrows"):
            # the SQL-STANDARD dialect (round 13): strict contiguity,
            # greedy +/* quantifiers, AFTER MATCH SKIP PAST LAST ROW,
            # optional ALL ROWS PER MATCH — lowered onto
            # operators/cep.py::match_pattern (run-length encoding +
            # run-level window conditions). Fixed output schema; the
            # MEASURES clause stays on the plain-pattern path.
            if m.group("measures"):
                raise ValueError(
                    "MATCH_RECOGNIZE: MEASURES is not supported together "
                    "with quantifiers / SKIP PAST LAST ROW / ALL ROWS PER "
                    "MATCH (fixed output schema in this subset)"
                )
            if not m.group("pastlast") and quantified:
                raise ValueError(
                    "MATCH_RECOGNIZE: quantified patterns require AFTER "
                    "MATCH SKIP PAST LAST ROW in this subset (SKIP TO "
                    "NEXT ROW enumerates overlapping suffix matches)"
                )
            from lance_flink_spark.operators.cep import match_pattern

            return match_pattern(
                self.spark.table(tbl),
                [defs[v.upper()][1] + q for v, q in pat_pairs],
                within=within,
                key_col=key,
                ts_col=ts,
                type_col=type_col,
                id_col="event_id",
                rows_per_match="all" if m.group("allrows") else "one",
            )
        # id column: the measure on the first variable's non-ts column
        # names it; default event_id (the benchmark schema)
        id_col = "event_id"
        measures = []
        if m.group("measures"):
            for piece in m.group("measures").split(","):
                mm = _MR_MEASURE.match(piece.strip())
                if not mm:
                    raise ValueError(
                        f"MATCH_RECOGNIZE: unsupported MEASURE {piece.strip()!r}"
                    )
                measures.append(
                    (mm.group("var").upper(), mm.group("col"), mm.group("alias"))
                )
            for var, col, _ in measures:
                if col != ts and var == pat_vars[0].upper():
                    id_col = col
        out = match_sequence(
            self.spark.table(tbl),
            steps,
            within=within,
            key_col=key,
            ts_col=ts,
            type_col=type_col,
            id_col=id_col,
        )
        if not measures:
            return out
        var_idx = {v.upper(): i for i, v in enumerate(pat_vars)}
        from pyspark.sql import functions as F

        sel = [F.col(key)]
        for var, col, alias in measures:
            if col == ts:
                sel.append(F.col(f"t{var_idx[var]}_us").alias(alias))
            elif var == pat_vars[0].upper():
                sel.append(F.col("start_event_id").alias(alias))
            else:
                raise ValueError(
                    f"MATCH_RECOGNIZE: only the first pattern variable's "
                    f"{id_col!r} and any variable's {ts!r} are measurable "
                    f"in this subset (got {var}.{col})"
                )
        return out.select(*sel)

    def _temporal_join(self, m: re.Match) -> DataFrame:
        """Flink event-time temporal table join: each fact row joins
        the dim row valid AS OF the fact's event time — the latest dim
        row with dim.<ts> <= fact.<ts> for the key (Flink "Temporal
        Joins", event-time variant; the dim is an SCD changelog whose
        rows carry their validity-start in the same-named time column).

        Lowers onto ``operators/temporal.asof_join`` (union + keyed
        last-value window — one shuffle on the key, no range fan-out),
        registers the result as a temp view, strips the fact/dim
        qualifiers from the rest of the statement, and hands the
        remainder to Spark SQL. Restrictions (documented Flink-dialect
        subset): single equality key, dim's time attribute shares the
        fact's AS OF column name, payload names must not collide."""
        fact_n, dim_n = m.group("fact"), m.group("dim")
        for n in (fact_n, dim_n):
            if self._in_catalog(n):
                self._register(n)
        fact = self.spark.table(fact_n)
        dim = self.spark.table(dim_n)
        ts, lk, rk = m.group("ts"), m.group("lk"), m.group("rk")
        if ts not in dim.columns:
            raise ValueError(
                f"temporal join: dim {dim_n!r} has no event-time column {ts!r}"
            )
        if rk != lk:
            dim = dim.withColumnRenamed(rk, lk)
        from lance_flink_spark.operators.temporal import asof_join

        joined = asof_join(fact, dim, on=lk, left_ts=ts, right_ts=ts)
        view = "__temporal_join"
        joined.createOrReplaceTempView(view)
        fa, da = m.group("fa"), m.group("da")
        rest = m.group("rest") or ""
        text = f"{m.group('head')} FROM {view}{rest}"
        for q in (f"{fa}.", f"{da}."):
            text = text.replace(q, "")
        return self.spark.sql(_rewrite_array_literals(text))

    def _in_catalog(self, name: str) -> bool:
        try:
            return self.catalog.table_exists(self.database, name)
        except Exception:  # noqa: BLE001 - dispatch guard, never a failure
            return False

    def _try_native_table(self, name: str, path: str) -> bool:
        """Register ``name`` as a native-Lance table (reads + the
        INSERT/DELETE write subset) when
        ``path`` has the native layout (``_versions/`` manifests, no
        ``_manifest.json``) — the reference connector's own datasets
        read through the same WITH('connector'='lance') surface."""
        import os

        if not (
            path
            and os.path.isdir(os.path.join(path, "_versions"))
            and not os.path.exists(os.path.join(path, "_manifest.json"))
        ):
            return False
        from lance_flink_spark.sources.lance_native import LanceNativeDataset

        nds = LanceNativeDataset(path)
        self._native_df(nds).createOrReplaceTempView(name)
        self.native_tables[name] = nds
        self._refresh_views()
        return True

    def _native_df(self, nds, version=None, with_offsets=False, columns=None):
        """The SQL surface's ONE native read path: the distributed
        one-task-per-fragment reader (lance_native.read_distributed —
        the reference's LanceInputFormat split model). The driver
        never materializes the data, so pointing SQL at a multi-GB
        foreign dataset is bounded by the cluster, not driver memory;
        each fragment still honors the 256 MB in-task decode gate.

        Catalyst cannot size a mapInPandas source (its estimate is the
        worst-case default, so a small native dim would never auto-
        broadcast in a join); the plain-read path attaches a
        size-gated broadcast hint from the manifest's own byte
        accounting — fragment file sizes scaled by the live-row
        fraction, the same estimate ANALYZE feeds the parquet side.
        Mutation/probe reads (offsets, projections) stay unhinted."""
        from lance_flink_spark.sources.lance_native import read_distributed

        df = read_distributed(
            nds,
            self.spark,
            version=version,
            with_offsets=with_offsets,
            columns=columns,
        )
        if with_offsets or columns is not None:
            return df
        try:
            from lance_flink_spark.registry import _parse_bytes
            from lance_flink_spark.sources.lance_native import (
                read_deletion_file,
            )

            limit = _parse_bytes(
                self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            )
            if limit <= 0:
                return df
            _fields, frags, _v = nds._manifest(version)
            est = 0
            for fr in frags:
                sz = sum(
                    os.path.getsize(os.path.join(nds.root, "data", f.path))
                    for f in fr.all_files()
                )
                if fr.deletion is not None and fr.physical_rows:
                    live = fr.physical_rows - len(
                        read_deletion_file(nds.root, fr)
                    )
                    sz = int(sz * live / fr.physical_rows)
                est += sz
                if est > limit:
                    return df
            return F.broadcast(df)
        except Exception:  # noqa: BLE001 - unsizeable → no hint
            return df

    def _native_index_dir(self, nds, col: str) -> str:
        return os.path.join(nds.root, "_vector_index_spark", col)

    def _create_index_native(self, m: re.Match) -> DataFrame:
        """CREATE INDEX on a NATIVE Lance table (round 14): builds THIS
        engine's sidecar vector index (IVF_FLAT/PQ/SQ/HNSW) over the
        distributed native read, each entry carrying the row's global
        physical offset — Lance's own model (indexes store row
        addresses, deletion files mask them at query time). A sidecar
        meta records the built version + fragment ids: DELETE-only
        commits stay servable (masks applied at query), fragment-set
        changes (INSERT/compaction/overwrite) make it stale —
        vector_search warns and brute-forces. The payload is OUR
        parquet sidecar format, not `_indices/` (that stays the Lance
        library's domain, SURVEY §6)."""
        import json

        from lance_flink_spark.index.options import build_index_from_options

        name, col = m.group("name"), m.group("col")
        using = (m.group("using") or "IVF_FLAT").upper()
        if using in ("SCALAR", "BLOOM"):
            raise ValueError(
                f"CREATE INDEX USING {using} on a native table is "
                "outside the subset — native scalar lookups read the "
                "fragment pages directly"
            )
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or ""))
        nds = self.native_tables[name]
        if opts.get("index.payload") == "native":
            # r15: build the MANIFEST-REGISTERED `_indices/{uuid}/`
            # IVF_FLAT payload (sources/native_index.py) instead of
            # the parquet sidecar — the index the reference stack
            # would see and serve; vector_search routes through it
            # via _manifest_index_search
            if using != "IVF_FLAT":
                raise ValueError(
                    "index.payload='native' supports USING IVF_FLAT "
                    "only — PQ/HNSW payloads are the Lance library's "
                    "binary formats (SURVEY §6)"
                )
            from lance_flink_spark.sources.native_index import (
                build_ivf_flat_index,
            )

            uid = build_ivf_flat_index(
                nds.root, col, self.spark,
                num_partitions=int(opts.get("index.num-partitions", 16)),
            )
            self._reregister_native(name)
            nds2 = self.native_tables[name]
            return self.spark.createDataFrame(
                [(name, col, "IVF_FLAT_NATIVE", int(nds2.versions()[-1]), uid)],
                "table string, column string, using string, "
                "version long, uuid string",
            )
        df = self._native_df(nds, with_offsets=True)
        idx_dir = self._native_index_dir(nds, col)
        build_index_from_options(
            self.spark,
            df,
            idx_dir,
            {**opts, "index.type": using, "index.column": col},
        )
        _fields, frags, version = nds._manifest()
        with open(os.path.join(idx_dir, "_native_binding.json"), "w") as f:
            json.dump(
                {
                    "built_version": version,
                    "frag_ids": sorted(fr.frag_id for fr in frags),
                    # identity, not just ids: OVERWRITE renumbers
                    # fragments from 0, so an overwrite with the same
                    # fragment COUNT would pass an id-only check and
                    # serve the old data's offsets against new rows;
                    # uuid file names make (id, path) rewrite-proof
                    "frag_sig": sorted(
                        [fr.frag_id, fr.path] for fr in frags
                    ),
                },
                f,
            )
        return self.spark.createDataFrame(
            [(name, col, using, int(version))],
            "table string, column string, using string, version long",
        )

    def _native_index_search(self, nds, col, vec, k, metric):
        """Serve vector_search from the native table's sidecar index
        when it exists and is still addressable: fresh (same version)
        serves directly; DELETE-only drift serves with the current
        deletion masks anti-joined (over-fetched by the deleted count);
        fragment-set drift returns None → caller warns + brutes."""
        import json
        import warnings

        import numpy as np

        from lance_flink_spark.index.options import (
            search_index_with_options,
        )
        from lance_flink_spark.sources.lance_native import (
            read_deletion_file,
        )

        idx_dir = self._native_index_dir(nds, col)
        binding = os.path.join(idx_dir, "_native_binding.json")
        if not os.path.exists(binding):
            return None
        meta = json.load(open(binding))
        fields, frags, version = nds._manifest()
        if col not in {f.name for f in fields}:
            # defense in depth: DROP COLUMN refuses while an index
            # covers the column, but a binding orphaned any other way
            # must not serve ghost vectors for a column that's gone
            raise ValueError(
                f"vector_search column {col!r} is not in the table's "
                f"current schema ({[f.name for f in fields]}) — its "
                "sidecar index is orphaned; DROP INDEX to clean it up"
            )
        # compare fragment IDENTITY (id, data-file path) when the
        # binding carries it: ids alone are not rewrite-proof —
        # OVERWRITE renumbers from 0, so a same-count overwrite would
        # pass an id-only check and serve stale offsets as live rows.
        # A column BACKFILL keeps (id, path) and relocates nothing, so
        # the index correctly stays servable across it.
        cur_sig = sorted([fr.frag_id, fr.path] for fr in frags)
        bound_sig = meta.get("frag_sig")
        drifted = (
            cur_sig != bound_sig
            if bound_sig is not None
            else sorted(fr.frag_id for fr in frags) != meta["frag_ids"]
        )
        if drifted:
            warnings.warn(
                f"native index on {col!r} is STALE (fragment set changed "
                f"since version {meta['built_version']}) — rebuild with "
                "CREATE INDEX; falling back to exact brute-force",
                stacklevel=2,
            )
            return None
        dead: list[int] = []
        if version != meta["built_version"]:
            base = 0
            for fr in frags:
                if fr.deletion is not None:
                    dead.extend(
                        (read_deletion_file(nds.root, fr) + base).tolist()
                    )
                base += fr.physical_rows
            if len(dead) > 4_000_000:
                warnings.warn(
                    "over 4M deletions since the index build — compact "
                    "and rebuild; falling back to brute-force",
                    stacklevel=2,
                )
                return None
        fetch = k + len(dead)
        opts = {"index.type": "IVF_FLAT", "vector.metric": metric}
        res = search_index_with_options(self.spark, idx_dir, vec, fetch, opts)
        if dead:
            dd = self.spark.createDataFrame(
                [(int(d),) for d in dead], "__phys long"
            )
            res = res.join(dd, "__phys", "left_anti")
        order = [c for c in ("distance", "similarity") if c in res.columns]
        if order:
            res = res.orderBy(
                F.col(order[0]).asc()
                if order[0] == "distance"
                else F.col(order[0]).desc()
            )
        return res.limit(k).drop("__phys")

    def _manifest_index_search(self, nds, tbl, col, vec, k, metric):
        """Serve vector_search from a MANIFEST-registered index (the
        IndexSection the reference's LanceIndexBuilder persists via
        com.lancedb.lance) when its payload is the IVF_FLAT subset
        sources/native_index.py decodes. Staleness is rewrite-proof:
        a drifted dataset_version serves only if the build-version
        manifest's (frag_id, path) list equals the current one —
        i.e. ONLY deletion files changed — with the current deletion
        masks applied (over-fetch by the deleted count, Lance's
        query-time DV model). PQ/HNSW payloads, library containers,
        missing payloads, and fragment-set drift warn WHY and return
        None → the caller brute-forces, exactly."""
        import warnings

        from lance_flink_spark.operators.similarity import knn
        from lance_flink_spark.sources.lance_native import (
            UnsupportedLanceFeature,
            read_index_section,
        )
        from lance_flink_spark.sources.native_index import (
            dead_offsets,
            search_ivf_flat,
        )

        fields, frags, version = nds._manifest()
        fld = next((f for f in fields if f.name == col), None)
        if fld is None:
            return None
        col_ids = {fld.fid} | {c.fid for c in fld.children}
        mpath = os.path.join(
            nds.root, "_versions", f"{version}.manifest"
        )
        metas = [
            m
            for m in read_index_section(mpath)
            if col_ids & set(m.field_ids)
        ]
        if not metas:
            return None
        meta = metas[-1]  # latest registration wins
        if meta.dataset_version != version:
            try:
                _bf, bfrags, _bv = nds._manifest(meta.dataset_version)
            except Exception:
                bfrags = None
            same_frags = bfrags is not None and sorted(
                [fr.frag_id, fr.path] for fr in bfrags
            ) == sorted([fr.frag_id, fr.path] for fr in frags)
            if not same_frags:
                warnings.warn(
                    f"native index {meta.name or meta.uuid!r} on "
                    f"{col!r} is STALE (fragment set changed since "
                    f"version {meta.dataset_version}) — "
                    "update_ivf_flat_index folds appended fragments "
                    "in; replaced fragments need a rebuild; falling "
                    "back to exact brute-force search",
                    stacklevel=2,
                )
                return None
        dead = dead_offsets(nds.root)
        if len(dead) > 4_000_000:
            warnings.warn(
                "over 4M deletions since the index build — compact "
                "and rebuild; falling back to exact brute-force search",
                stacklevel=2,
            )
            return None
        topts = self.options.get(tbl)
        extra = dict((topts.extra or {}) if topts else {})
        nprobes = int(extra.get("vector.nprobes", 20))
        try:
            hits = search_ivf_flat(
                nds.root, meta, vec, k + len(dead),
                nprobes=nprobes, metric=metric,
            )
        except UnsupportedLanceFeature as e:
            warnings.warn(
                f"native table {tbl!r} carries a library-built index "
                f"{meta.name or meta.uuid!r} "
                f"({meta.details_type or 'unknown type'}) on {col!r}, "
                f"but its payload does not serve ({e}) — falling back "
                "to exact brute-force search",
                stacklevel=2,
            )
            return None
        dead_set = {int(x) for x in dead}
        ids = [rid for rid, _s in hits if rid not in dead_set]
        if not ids:
            return None
        ids_df = self.spark.createDataFrame(
            [(int(i),) for i in ids], "__phys long"
        )
        # row-address fetch prunes to the fragments holding the hits
        # (searchsorted over the fragment base offsets — at 100 TB a
        # k-row fetch decodes ≤ k fragments, never the table) and
        # exact re-scores the candidates through the same KNN contract
        # as brute force — identical rounding, tie-break, and
        # (distance, similarity) columns, so index-served results are
        # comparable row-for-row
        import numpy as np

        from lance_flink_spark.sources.lance_native import (
            read_distributed,
        )

        bounds = np.cumsum(
            [0] + [fr.physical_rows for fr in frags], dtype="int64"
        )
        hit_frags = sorted(
            set(
                int(i)
                for i in np.searchsorted(
                    bounds, np.asarray(ids, dtype="int64"), side="right"
                )
                - 1
            )
        )
        sub = (
            read_distributed(
                nds, self.spark, with_offsets=True,
                frag_indices=hit_frags,
            )
            .join(F.broadcast(ids_df), "__phys")
            .drop("__phys")
        )
        return knn(sub, vec, k, vec_col=col, metric=metric)

    def _tvf_relation(self, tbl: str):
        """Resolve a TVF's table argument: native tables and catalog
        tables are registered as views, and a caller-registered temp
        view works the same — unknown names fail with the usual
        TABLE_OR_VIEW_NOT_FOUND."""
        return self.spark.table(tbl)

    def _fim_tvf(self, m: re.Match):
        """``fim_transform('t', 'id', 'text')`` — the fill-in-middle
        PSM rearrangement (functions.text.fim_rearrange) as a SQL
        table function: (id, n_prefix, n_middle, n_suffix, fim_text).
        Deterministic md5-seeded cuts; pure Catalyst, map-only."""
        from lance_flink_spark.functions.text import fim_rearrange

        return fim_rearrange(
            self._tvf_relation(m.group("tbl")),
            id_col=m.group("id"),
            text_col=m.group("txt"),
        )

    def _phash_tvf(self, m: re.Match):
        """``perceptual_hash('t', 'content', 'id'[, 'image'|'audio'])``
        — the perceptual fingerprint pass as a SQL table function:
        (id, dhash|audio_fp). 'image' (default) decodes PPM/PNG/JPEG
        pixels and dHashes them; 'audio' fingerprints WAV spectra.
        One Arrow-batched mapInPandas pass (operators.dedup's shared
        scaffold) — the backfill-ish Python-batch compute the ALTER
        TABLE AS (expr) surface can't express, reachable from SQL."""
        from lance_flink_spark.operators.dedup import _fingerprint_frame

        mode = (m.group("mode") or "image").lower()
        if mode == "audio":
            from lance_flink_spark.functions.multimodal import audio_fp64

            fn, out = audio_fp64, "audio_fp"
        else:
            from lance_flink_spark.functions.multimodal import dhash64

            fn, out = dhash64, "dhash"
        return _fingerprint_frame(
            self._tvf_relation(m.group("tbl")),
            fn,
            out,
            m.group("col"),
            m.group("id"),
        )

    def _table_changes(self, m: re.Match):
        """Delta's ``table_changes('t', from [, to])`` TVF over a
        NATIVE table — the change feed (lance_native.
        read_changes_distributed) as a SQL relation: inserts from
        appeared fragments, deletes with pre-image values, an UPDATE
        commit's delete+insert pair under one _commit_version.
        Parquet-backed tables need a declared row key for their CDF —
        use Dataset.read_changes; the TVF refuses with that hint."""
        tbl = m.group("tbl")
        if tbl in self.native_tables:
            from lance_flink_spark.sources.lance_native import (
                read_changes_distributed,
            )

            to = m.group("to")
            return read_changes_distributed(
                self.native_tables[tbl].root,
                self.spark,
                int(m.group("frm")),
                int(to) if to else None,
            )
        if self._in_catalog(tbl):
            raise ValueError(
                f"table_changes({tbl!r}): the parquet-backed CDF is "
                "keyed — call Dataset.read_changes(spark, key, "
                "since_version, version) with the row-identity column"
            )
        raise ValueError(f"table_changes: unknown table {tbl!r}")

    def _update_native(
        self, name: str, assignments: dict[str, str], pred: str | None
    ) -> None:
        """UPDATE a NATIVE Lance table — Lance's rewrite shape (delete
        + append of the changed rows) in ONE manifest commit
        (lance_native.mutate_rows_distributed): matched offsets are
        resolved and their deletion files written INSIDE per-fragment
        executor tasks, the updated copies land as executor-written
        fragments; unmatched rows are never rewritten and no matched
        row ever moves through the driver — there is no row gate on
        this path. SET expressions evaluate against the pre-update
        row, standard SQL semantics."""
        from lance_flink_spark.sources.lance_native import (
            mutate_rows_distributed,
        )

        nds = self.native_tables[name]
        df = self._native_df(nds, with_offsets=True)
        names = [c for c in df.columns if c != "__phys"]
        for c in assignments:
            if c not in names:
                raise ValueError(
                    f"UPDATE SET target {c!r} is not a column of {name!r}"
                )
        matched = df.filter(_rewrite_array_literals(pred)) if pred else df
        updated = matched.select(
            *[
                (
                    F.expr(assignments[c]).cast(df.schema[c].dataType)
                    if c in assignments
                    else F.col(f"`{c}`")
                ).alias(c)
                for c in names
            ]
        )
        mutate_rows_distributed(
            nds.root, matched.select("__phys"), updated,
            expected_version=nds._manifests[-1],
        )
        self._reregister_native(name)
        return None

    def _merge_when_native(
        self, name: str, aligned, on: str, clauses: list[dict]
    ) -> None:
        """Conditional MERGE INTO a NATIVE Lance table (first matching
        WHEN clause wins per row, Delta semantics): one full-outer join
        classifies every row, matched UPDATE/DELETE rows tombstone by
        physical offset (deletion files written INSIDE per-fragment
        executor tasks — no driver row gate), updated copies +
        admitted inserts land as executor-written fragments — ONE
        manifest commit (lance_native.mutate_rows_distributed), so no
        reader observes the delete without the append. Duplicate source keys refuse
        (two clauses would fire on one target row,
        nondeterministically). The unconditional MERGE routes here as
        its two implicit clauses — Lance merge_insert."""
        from lance_flink_spark.sources.lance_native import (
            mutate_rows_distributed,
        )

        nds = self.native_tables[name]
        dup = aligned.groupBy(on).count().filter("count > 1").limit(1)
        if dup.count():
            raise ValueError(
                f"MERGE source has duplicate {on!r} keys — per-target-row "
                "clause selection would be nondeterministic"
            )
        # matched rows come from an INNER join (broadcast-able when the
        # source is small — a full_outer would force shuffling the
        # whole table for a one-row merge); target-only rows are
        # untouched by definition and never classified. NULL-key
        # source rows never equal anything, so they fall through to
        # the not-matched side — SQL equality semantics preserved.
        t = self._native_df(nds, with_offsets=True).alias("t")
        s = aligned.alias("s")
        m = t.join(s, F.col(f"t.`{on}`") == F.col(f"s.`{on}`"), "inner")
        tsch = self._native_df(nds).schema
        cols = [f.name for f in tsch.fields]
        mact = None
        for k, cl in enumerate(clauses):
            if not cl["matched"]:
                continue
            c = (
                F.expr(_rewrite_array_literals(cl["cond"]))
                if cl["cond"]
                else F.lit(True)
            )
            mact = F.when(c, F.lit(k)) if mact is None else mact.when(c, F.lit(k))
        m = m.withColumn(
            "__act", mact.otherwise(F.lit(-1)) if mact is not None else F.lit(-1)
        )
        touch = [k for k, cl in enumerate(clauses) if cl["matched"]]
        offs_df = (
            m.filter(F.col("__act").isin(touch)).select(
                F.col("t.`__phys`").alias("__phys")
            )
            if touch
            else None
        )
        appends = []
        for k, cl in enumerate(clauses):
            if cl["matched"] and cl["action"] == "update":
                appends.append(
                    m.filter(F.col("__act") == k).select(
                        *[
                            F.expr(
                                _rewrite_array_literals(cl["sets"][c])
                                if c in cl["sets"]
                                else f"t.`{c}`"
                            )
                            .cast(tsch[c].dataType)
                            .alias(c)
                            for c in cols
                        ]
                    )
                )
        # NOT MATCHED: source keys the inner join missed — the anti
        # join's build side is the matched keys (≤ |source|, broadcast)
        nm_clauses = [
            (k, cl) for k, cl in enumerate(clauses) if not cl["matched"]
        ]
        if nm_clauses:
            mk = m.select(F.col(f"s.`{on}`").alias(on)).distinct()
            nm = s.join(F.broadcast(mk), on, "left_anti").alias("s")
            nact = None
            for k, cl in nm_clauses:
                c = (
                    F.expr(_rewrite_array_literals(cl["cond"]))
                    if cl["cond"]
                    else F.lit(True)
                )
                nact = (
                    F.when(c, F.lit(k)) if nact is None else nact.when(c, F.lit(k))
                )
            nm = nm.withColumn("__act", nact.otherwise(F.lit(-1)))
            for k, cl in nm_clauses:
                if cl["action"] == "insert":
                    appends.append(
                        nm.filter(F.col("__act") == k).select(
                            *[
                                F.col(f"s.`{c}`")
                                .cast(tsch[c].dataType)
                                .alias(c)
                                for c in cols
                            ]
                        )
                    )
            # delete of a not-matched row: nothing to do
        if offs_df is None and not appends:
            self._reregister_native(name)
            return None
        app = appends[0] if appends else None
        for a in appends[1:]:
            app = app.unionByName(a)
        mutate_rows_distributed(
            nds.root, offs_df, app, expected_version=nds._manifests[-1]
        )
        self._reregister_native(name)
        return None

    def _reregister_native(self, name: str) -> None:
        """Refresh a native table's snapshot view + cached manifest
        list after a write (temp views pin the frame at creation)."""
        from lance_flink_spark.sources.lance_native import LanceNativeDataset

        nds = LanceNativeDataset(self.native_tables[name].root)
        self._native_df(nds).createOrReplaceTempView(name)
        self.native_tables[name] = nds
        self._refresh_views()

    def _alter_add_native(self, m: re.Match) -> None:
        """``ALTER TABLE t ADD COLUMN(S) ...`` on a NATIVE Lance table:
        ONE metadata-only manifest commit for the whole column list
        (lance_native.add_columns — the new field ids append to the
        schema, no fragment is touched, every column validates before
        anything commits so the statement is atomic-or-refused);
        existing rows read NULL, later INSERTs carry the columns.
        Reference parity: com.lancedb.lance.Dataset schema evolution."""
        from pyspark.sql.pandas.types import to_arrow_type

        from lance_flink_spark.sources.lance_native import add_columns

        name = m.group("name")
        added = T._parse_datatype_string(
            f"struct<{_spark_ddl_types(_strip_comments(m.group('cols')))}>"
        )
        add_columns(
            self.native_tables[name].root,
            [(f.name, to_arrow_type(f.dataType)) for f in added.fields],
        )
        self._reregister_native(name)
        return None

    def _alter_merge_columns_native(self, m: re.Match) -> None:
        """``ALTER TABLE t MERGE COLUMNS (<query>) ON <key>`` on a
        NATIVE Lance table: Lance's ``Dataset.merge`` — the query's
        non-key columns attach by key join, zero-rewrite (per-fragment
        data files zipped at physical offsets; unmatched rows read
        NULL; duplicate source keys refuse). The query runs through
        this engine (its views, time travel, TVFs all apply)."""
        from lance_flink_spark.sources.lance_native import merge_columns

        name = m.group("name")
        src = self.execute(m.group("q"))
        merge_columns(
            self.native_tables[name].root, src, m.group("on"), self.spark
        )
        self._reregister_native(name)
        return None

    def _alter_add_backfill_native(self, m: re.Match) -> None:
        """``ALTER TABLE t ADD COLUMN x <type> AS (<expr>)`` — or an
        ``ADD COLUMNS (...)`` list mixing computed and plain columns —
        on a NATIVE Lance table: zero-rewrite column backfill.
        Executors compute every expression per fragment in ONE decode
        pass (Catalyst-evaluated, only the referenced columns read)
        and write one data file per fragment carrying all the computed
        columns; ONE manifest commit plates the fields
        (lance_native.add_columns_backfill); plain columns in the list
        ride the same commit file-less (reads NULL). Existing data
        files are never rewritten. Reference parity: Lance add_columns
        with SQL transforms through com.lancedb.lance.Dataset."""
        from pyspark.sql.pandas.types import to_arrow_type

        from lance_flink_spark.sources.lance_native import (
            add_columns_backfill,
        )

        name = m.group("name")
        body = _strip_outer_parens(m.group("body"))
        specs = []
        for item in _split_top_commas(body):
            mm = _BACKFILL_ITEM.match(_strip_comments(item))
            if not mm:
                raise ValueError(
                    f"cannot parse ADD COLUMN item {item!r} — expected "
                    "`name TYPE [AS (expr)]`"
                )
            dt = T._parse_datatype_string(mm.group("type"))
            specs.append(
                (mm.group("col"), to_arrow_type(dt), mm.group("expr"))
            )
        add_columns_backfill(
            self.native_tables[name].root, specs, self.spark
        )
        self._reregister_native(name)
        return None

    def _alter_drop_native(self, m: re.Match) -> None:
        """``ALTER TABLE t DROP COLUMN(S) ...`` on a NATIVE Lance
        table: ONE metadata-only manifest commit removing the whole
        field list — data pages stay on disk (old versions time-travel
        to them) and are reclaimed at the next OPTIMIZE rewrite. Every
        column is validated (exists, not index-covered) BEFORE the
        commit, so a failure mid-list can never leave a partially
        applied DDL behind."""
        from lance_flink_spark.sources.lance_native import drop_columns

        name = m.group("name")
        cols = [x.strip() for x in m.group("cols").split(",") if x.strip()]
        for c in cols:
            # same rule as the manifest's IndexSection check inside
            # drop_columns: a sidecar vector index bound to the column
            # would keep serving ghost results after the drop
            if os.path.isdir(
                self._native_index_dir(self.native_tables[name], c)
            ):
                raise ValueError(
                    f"column {c!r} is covered by a sidecar vector index "
                    f"— DROP INDEX ON {name} ({c}) before dropping it"
                )
        drop_columns(self.native_tables[name].root, cols)
        self._reregister_native(name)
        return None

    def _optimize_native(self, m: re.Match) -> None:
        """``OPTIMIZE t [BINPACK]`` on a NATIVE Lance table: bin-pack
        compaction (lance_native.compact_dataset) — consecutive small
        fragments merge, deletion files materialize away, dropped
        columns' bytes are reclaimed; rewrites run one-task-per-bin on
        the executors, the driver commits the manifest.
        ``OPTIMIZE t INDEXES`` (r15) is Lance's optimize_indices:
        every manifest-registered IVF_FLAT index folds in the
        fragments appended since its build
        (native_index.update_ivf_flat_index) — no retrain, touched
        partition files merge in one task each. ZORDER is the
        parquet-backed Dataset's clustering machinery — refuse."""
        from lance_flink_spark.sources.lance_native import compact_dataset

        name = m.group("name")
        if m.group("cols"):
            raise ValueError(
                f"OPTIMIZE {name} ZORDER BY: Z-order clustering on "
                "native Lance tables is outside the subset — copy into "
                "a parquet-backed table for clustered rewrites"
            )
        if m.group("indexes"):
            from lance_flink_spark.sources.lance_native import (
                read_index_section,
            )
            from lance_flink_spark.sources.native_index import (
                update_ivf_flat_index,
            )

            nds = self.native_tables[name]
            fields, _frags, version = nds._manifest()
            by_id = {f.fid: f.name for f in fields}
            mpath = os.path.join(
                nds.root, "_versions", f"{version}.manifest"
            )
            metas = read_index_section(mpath)
            if not metas:
                raise ValueError(
                    f"OPTIMIZE {name} INDEXES: no registered indexes"
                )
            for ix in metas:
                col = next(
                    (by_id[i] for i in ix.field_ids if i in by_id), None
                )
                if col is not None:
                    update_ivf_flat_index(nds.root, col, self.spark)
            self._reregister_native(name)
            return None
        compact_dataset(self.native_tables[name].root, self.spark)
        self._reregister_native(name)
        return None

    def _insert_native(self, name: str, overwrite: bool, df) -> None:
        """INSERT INTO a NATIVE Lance table: rows conform to the
        manifest's exact physical types (timestamp unit, float width)
        and append as new 'Lance File 2.0' fragment(s) + a manifest
        version. Round 14: the fragments are written EXECUTOR-side
        (lance_native.append_to_dataset_distributed — the reference's
        LanceSink task-write/coordinator-commit model), so bulk loads
        scale with the cluster instead of hitting a driver gate. The
        reference demo's flagship statement (flink-sql-demo.sql INSERT
        INTO lance tables) lands on real native format. INSERT
        OVERWRITE commits a version with ONLY the new fragments (old
        versions stay time-travelable — Lance overwrite semantics)."""
        from lance_flink_spark.sources.lance_native import (
            append_to_dataset_distributed,
            overwrite_dataset_distributed,
        )

        nds = self.native_tables[name]
        fields, _frags, _v = nds._manifest()
        target = self._native_df(nds).schema  # plan-only, no job
        if len(df.columns) != len(target.fields):
            raise ValueError(
                f"INSERT arity {len(df.columns)} != table arity "
                f"{len(target.fields)}"
            )
        aligned = df.select(
            *[
                F.col(f"`{c}`").cast(f.dataType).alias(f.name)
                for c, f in zip(df.columns, target.fields)
            ]
        )
        # executor-parallel write (round 14): fragments are written
        # task-side conformed to the manifest's physical schema — no
        # driver materialization, no row gate; the pyarrow-Table API
        # (append_to_dataset) keeps its driver-side 4M-gated path.
        # The table's declared write.max-rows-per-file rides into the
        # task-side fragment flush (LanceOptions parity).
        topts = self.options.get(name)
        kw = (
            {"max_rows_per_file": topts.write_max_rows_per_file}
            if topts is not None and topts.write_max_rows_per_file
            else {}
        )
        if overwrite:
            overwrite_dataset_distributed(nds.root, aligned)
        else:
            append_to_dataset_distributed(nds.root, aligned, **kw)
        self._reregister_native(name)

    def _delete_native(self, name: str, pred: str | None) -> None:
        """DELETE FROM a NATIVE Lance table: the predicate evaluates
        over the decoded rows WITH their global physical offsets, and
        the matched offsets become per-fragment Arrow deletion files
        written INSIDE the per-fragment executor tasks + ONE manifest
        version (sources/lance_native.mutate_rows_distributed) —
        Lance's deletion-file mutation, no data file rewritten and no
        matched row moved through the driver (no row gate)."""
        from lance_flink_spark.sources.lance_native import (
            mutate_rows_distributed,
        )

        nds = self.native_tables[name]
        # prune the offset-resolution scan to the predicate's columns —
        # a DELETE on a wide table shouldn't decode every page
        fields, _frags, _v = nds._manifest()
        if pred:
            toks = set(re.findall(r"[A-Za-z_]\w*", pred))
            cols = sorted({f.name for f in fields} & toks) or None
        else:
            # unconditional DELETE: offsets only — decode one thin column
            cols = [fields[0].name]
        df = self._native_df(nds, with_offsets=True, columns=cols)
        if pred:
            df = df.filter(_rewrite_array_literals(pred))
        mutate_rows_distributed(
            nds.root, df.select("__phys"),
            expected_version=nds._manifests[-1],
        )
        self._reregister_native(name)

    def execute(self, sql: str) -> DataFrame | None:
        sql = sql.strip().rstrip(";")
        m = _TEMPORAL_JOIN.match(sql)
        if m and not m.group("ts").isdigit():
            return self._temporal_join(m)
        m = _MATCH_RECOGNIZE.match(sql)
        if m:
            return self._match_recognize(m)
        m = _CREATE_INDEX.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._create_index_native(m)
        if m and self._in_catalog(m.group("name")):
            return self._create_index(m)
        m = _VECTOR_SEARCH.match(sql)
        if m:
            return self._vector_search(m)
        m = _TABLE_CHANGES.match(sql)
        if m:
            return self._table_changes(m)
        m = _FIM_TVF.match(sql)
        if m:
            return self._fim_tvf(m)
        m = _PHASH_TVF.match(sql)
        if m:
            return self._phash_tvf(m)
        m = _COPY_INTO.match(sql)
        if m and self._in_catalog(m.group("name")):
            return self._copy_into(m)
        m = _SHOW_INDEXES.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._show_native_indexes(m.group("name"))
        if m and self._in_catalog(m.group("name")):
            return self._show_indexes(m.group("name"))
        m = _DROP_INDEX.match(sql)
        if m and m.group("name") in self.native_tables:
            import shutil as _sh

            nds = self.native_tables[m.group("name")]
            p = self._native_index_dir(nds, m.group("col"))
            if not os.path.isdir(p):
                raise ValueError(
                    f"no sidecar index on {m.group('name')}"
                    f"({m.group('col')})"
                )
            _sh.rmtree(p)
            return None
        if m and self._in_catalog(m.group("name")):
            return self._drop_index(m)
        m = _CREATE_MV.match(sql)
        if m:
            return self._create_mv(m)
        m = _REFRESH_MV.match(sql)
        if m:
            return self._refresh_mv(m.group("name"))
        m = _DROP_MV.match(sql)
        if m:
            self.matviews.pop(m.group("name"), None)
            self.spark.catalog.dropTempView(m.group("name"))
            return None
        created = _parse_create(sql)
        if created:
            return self._create(*created)
        m = _CTAS.match(sql)
        if m:
            return self._ctas(m)
        m = _INSERT.match(sql)
        if m:
            return self._insert(m)
        m = _DROP.match(sql + ";")
        if m:
            if m.group("ie") and not self._in_catalog(m.group("name")):
                return None
            self.catalog.drop_table(self.database, m.group("name"))
            self.spark.catalog.dropTempView(m.group("name"))
            return None
        m = _DROP_DB.match(sql)
        if m:
            known = m.group("name") in self.catalog.list_databases()
            if not known:
                if m.group("ie"):
                    return None
                raise CatalogError(f"unknown database {m.group('name')!r}")
            self.catalog.drop_database(
                m.group("name"),
                cascade=(m.group("cascade") or "").upper() == "CASCADE",
            )
            return None
        m = _DROP_CATALOG.match(sql)
        if m:
            name = m.group("name")
            if name not in self.catalogs:
                if m.group("ie"):
                    return None
                raise CatalogError(f"unknown catalog {name!r}")
            if self.catalogs[name] is self.catalog:
                raise CatalogError("cannot drop the active catalog")
            del self.catalogs[name]
            return None
        m = _CREATE_FUNCTION.match(sql)
        if m:
            # the reference registers LanceVectorSearchFunction this
            # way (flink-sql-demo.sql:229); our vector_search SQL
            # function is built in, so known classes are a no-op
            # registration and unknown ones fail loudly
            if not m.group("cls").endswith("LanceVectorSearchFunction"):
                raise ValueError(
                    f"unsupported function class {m.group('cls')!r}"
                )
            self.functions[m.group("name")] = m.group("cls")
            return None
        m = _ALTER_CAST_COL.match(sql)
        if m and m.group("name") in self.native_tables:
            from pyspark.sql.pandas.types import to_arrow_type

            from lance_flink_spark.sources.lance_native import (
                cast_column,
            )

            if os.path.isdir(
                self._native_index_dir(
                    self.native_tables[m.group("name")], m.group("col")
                )
            ):
                raise ValueError(
                    f"column {m.group('col')!r} is covered by a sidecar "
                    f"vector index — DROP INDEX ON {m.group('name')} "
                    f"({m.group('col')}) before casting it"
                )
            dt = T._parse_datatype_string(m.group("type"))
            cast_column(
                self.native_tables[m.group("name")].root,
                m.group("col"),
                to_arrow_type(dt),
                self.spark,
            )
            self._reregister_native(m.group("name"))
            return None
        if m and self._in_catalog(m.group("name")):
            raise ValueError(
                "ALTER COLUMN ... TYPE is a NATIVE-table zero-rewrite "
                f"cast; {m.group('name')!r} is a parquet-backed catalog "
                "table — UPDATE into a new column or CTAS with the cast"
            )
        m = _ALTER_RENAME_COL.match(sql)
        if m and m.group("name") in self.native_tables:
            from lance_flink_spark.sources.lance_native import (
                rename_column,
            )

            # a sidecar vector index binds by column NAME — a rename
            # would orphan it and vector_search would brute silently
            if os.path.isdir(
                self._native_index_dir(
                    self.native_tables[m.group("name")], m.group("old")
                )
            ):
                raise ValueError(
                    f"column {m.group('old')!r} is covered by a sidecar "
                    f"vector index — DROP INDEX ON {m.group('name')} "
                    f"({m.group('old')}) before renaming it"
                )
            rename_column(
                self.native_tables[m.group("name")].root,
                m.group("old"),
                m.group("new"),
            )
            self._reregister_native(m.group("name"))
            return None
        if m and self._in_catalog(m.group("name")):
            raise ValueError(
                "RENAME COLUMN is a NATIVE-table metadata commit; "
                f"{m.group('name')!r} is a parquet-backed catalog table "
                "— CTAS with the renamed projection"
            )
        m = _ALTER_RENAME.match(sql)
        if m:
            self.catalog.rename_table(self.database, m.group("name"), m.group("new"))
            self.spark.catalog.dropTempView(m.group("name"))
            if m.group("name") in self.options:
                self.options[m.group("new")] = self.options.pop(m.group("name"))
            self._register(m.group("new"))
            return None
        m = _ADD_CONSTRAINT.match(sql)
        if m and self._in_catalog(m.group("name")):
            self.catalog.load_table(self.database, m.group("name")).add_constraint(
                self.spark, m.group("cname"), m.group("expr")
            )
            return None
        m = _DROP_CONSTRAINT.match(sql)
        if m and self._in_catalog(m.group("name")):
            self.catalog.load_table(self.database, m.group("name")).drop_constraint(
                m.group("cname")
            )
            return None
        m = _ALTER_DROP.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._alter_drop_native(m)
        if m and self._in_catalog(m.group("name")):
            return self._alter_drop(m)
        m = _ALTER_MERGE_COLUMNS.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._alter_merge_columns_native(m)
        if m and self._in_catalog(m.group("name")):
            raise ValueError(
                "ALTER TABLE ... MERGE COLUMNS attaches columns to a "
                f"NATIVE Lance table zero-rewrite; {m.group('name')!r} "
                "is a parquet-backed catalog table — use a join + CTAS"
            )
        m = _ALTER_ADD_BACKFILL.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._alter_add_backfill_native(m)
        if m and self._in_catalog(m.group("name")):
            raise ValueError(
                f"ALTER TABLE ... ADD COLUMN ... AS (expr) backfills a "
                f"NATIVE Lance table zero-rewrite; {m.group('name')!r} "
                "is a parquet-backed catalog table — ADD the column, "
                "then UPDATE it (a rewrite), or CTAS"
            )
        m = _ALTER_ADD.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._alter_add_native(m)
        if m and self._in_catalog(m.group("name")):
            return self._alter_add(m)
        # DML/metadata statements route to the Dataset layer only for
        # tables this catalog owns; a DELETE/UPDATE/... against a plain
        # Spark temp view or built-in table falls through to spark.sql
        m = _DELETE.match(sql)
        if m and (
            self._in_catalog(m.group("name"))
            or m.group("name") in self.native_tables
        ):
            return self._delete(m)
        m = _UPDATE.match(sql)
        if m and (
            self._in_catalog(m.group("name"))
            or m.group("name") in self.native_tables
        ):
            return self._update(m)
        m = _MERGE_WHEN.match(sql)
        if m and (
            self._in_catalog(m.group("name"))
            or m.group("name") in self.native_tables
        ):
            return self._merge_when(m)
        m = _MERGE.match(sql)
        if m and (
            self._in_catalog(m.group("name"))
            or m.group("name") in self.native_tables
        ):
            return self._merge(m)
        m = _EXPLAIN.match(sql)
        if m:
            return self._explain(m.group("stmt").strip())
        if _SHOW_CATALOGS.match(sql):
            rows = [(c, "yes" if self.catalogs[c] is self.catalog else "")
                    for c in sorted(self.catalogs)]
            return self.spark.createDataFrame(
                rows, "catalog_name string, is_current string"
            )
        if _SHOW_VIEWS.match(sql):
            rows = [(v,) for v in sorted(set(self.matviews) | set(self.views))]
            return self.spark.createDataFrame(rows or [], "view_name string")
        m = _STATEMENT_SET.match(sql)
        if m:
            for stmt in m.group("body").split(";"):
                if stmt.strip():
                    self.execute(stmt)
            return None
        m = _CREATE_VIEW.match(sql)
        # guard: CREATE MATERIALIZED VIEW matched earlier; this regex
        # only sees plain/TEMPORARY views
        if m:
            name = m.group("name")
            if name in self.views and m.group("ine"):
                return None
            if name in self.views:
                raise CatalogError(f"view {name!r} already exists")
            select = m.group("select").strip()
            self._query(select).createOrReplaceTempView(name)  # validate now
            self.views[name] = select
            if not m.group("temp"):
                # catalog object: visible to every engine over this
                # warehouse (Flink non-TEMPORARY view semantics)
                self.catalog.save_view(self.database, name, select)
            return None
        m = _DROP_VIEW.match(sql)
        if m:
            name = m.group("name")
            if name not in self.views:
                if m.group("ie"):
                    return None
                raise CatalogError(f"unknown view {name!r}")
            del self.views[name]
            self.catalog.drop_view(self.database, name)  # no-op if temp
            self.spark.catalog.dropTempView(name)
            return None
        if _SHOW_FUNCTIONS.match(sql):
            rows = sorted(self.functions.items())
            return self.spark.createDataFrame(
                rows, "function_name string, class string"
            )
        m = _TRUNCATE.match(sql)
        if m and m.group("name") in self.native_tables:
            from lance_flink_spark.sources.lance_native import (
                truncate_dataset,
            )

            truncate_dataset(self.native_tables[m.group("name")].root)
            self._reregister_native(m.group("name"))
            return None
        if m and self._in_catalog(m.group("name")):
            # Flink 1.18 TRUNCATE TABLE: delete every row as a NEW
            # version (time travel to the pre-truncate snapshot keeps
            # working — this is a delete, not a vacuum)
            ds = self.catalog.load_table(self.database, m.group("name"))
            ds.delete_where(self.spark, "true")
            self._register(m.group("name"))
            return None
        m = _SET_QUOTED.match(sql)
        if m:
            self.spark.conf.set(m.group("k"), m.group("v"))
            return None
        m = _RESET_QUOTED.match(sql)
        if m:
            self.spark.conf.unset(m.group("k"))
            return None
        m = _SHOW_TABLES.match(sql)
        if m:
            rows = [
                (t,)
                for t in sorted(self.catalog.list_tables(m.group("db") or self.database))
            ]
            return self.spark.createDataFrame(rows or [], "table_name string")
        if _SHOW_DBS.match(sql):
            rows = [(d,) for d in sorted(self.catalog.list_databases())]
            return self.spark.createDataFrame(rows or [], "database_name string")
        m = _CREATE_DB.match(sql)
        if m:
            self.catalog.create_database(
                m.group("name"), ignore_if_exists=bool(m.group("ine"))
            )
            return None
        m = _CREATE_CATALOG.match(sql)
        if m:
            return self._create_catalog(m)
        m = _USE_CATALOG.match(sql)
        if m:
            if m.group("name") not in self.catalogs:
                raise CatalogError(f"unknown catalog {m.group('name')!r}")
            self.catalog = self.catalogs[m.group("name")]
            self.database = self.catalog.default_database
            return None
        m = _USE_DB.match(sql)
        if m:
            if m.group("name") not in self.catalog.list_databases():
                raise CatalogError(f"unknown database {m.group('name')!r}")
            self.database = m.group("name")
            return None
        m = _ANALYZE.match(sql)
        if m and self._in_catalog(m.group("name")):
            return self._analyze(m.group("name"), bool(m.group("cols")))
        m = _DESCRIBE.match(sql)
        if m and self._in_catalog(m.group("name")):
            ds = self.catalog.load_table(self.database, m.group("name"))
            schema = ds.read(self.spark).schema
            rows = [
                (f.name, f.dataType.simpleString(), f.nullable)
                for f in schema.fields
            ]
            if m.group("ext"):
                # DESCRIBE EXTENDED: append stored table statistics and
                # version info below the column block (Spark's layout)
                man = ds._load_manifest()
                stats = man.get("stats") or {}
                rows += [
                    ("", "", None),
                    ("# Detailed Table Information", "", None),
                    ("Location", ds.path, None),
                    ("Current Version", str(len(man.get("versions", []))), None),
                    (
                        "Statistics",
                        (
                            f"{stats['bytes']} bytes, {stats['rows']} rows "
                            f"(v{stats['version']})"
                            if stats
                            else "not computed (run ANALYZE TABLE)"
                        ),
                        None,
                    ),
                ]
                for cname, cs in sorted((stats.get("columns") or {}).items()):
                    rows.append(
                        (
                            f"# col stats: {cname}",
                            (
                                f"nulls={cs['null_count']} "
                                f"ndv~{cs['approx_ndv']} "
                                f"min={cs['min']} max={cs['max']}"
                            ),
                            None,
                        )
                    )
            return self.spark.createDataFrame(
                rows, "col_name string, data_type string, nullable boolean"
            )
        m = _OPTIMIZE.match(sql)
        if m and m.group("name") in self.native_tables:
            return self._optimize_native(m)
        if m:
            ds = self.catalog.load_table(self.database, m.group("name"))
            cols = m.group("cols")
            if m.group("binpack"):
                # incremental bin-packing (Delta OPTIMIZE semantics):
                # only the small-file tail is rewritten + superseded
                ds.compact_small(self.spark)
            else:
                ds.compact(
                    self.spark,
                    zorder_by=[c.strip() for c in cols.split(",")] if cols else None,
                )
            self._register(m.group("name"))
            return None
        m = _VACUUM.match(sql)
        if m and m.group("name") in self.native_tables:
            from lance_flink_spark.sources.lance_native import vacuum_dataset

            deleted = vacuum_dataset(
                self.native_tables[m.group("name")].root,
                keep_versions=int(m.group("keep") or 1),
            )
            self._reregister_native(m.group("name"))
            return self.spark.createDataFrame(
                [(f,) for f in deleted] or [], "deleted_file string"
            )
        if m:
            ds = self.catalog.load_table(self.database, m.group("name"))
            deleted = ds.vacuum(keep_versions=int(m.group("keep") or 1))
            return self.spark.createDataFrame(
                [(f,) for f in deleted] or [], "deleted_file string"
            )
        m = _RESTORE.match(sql)
        if m and m.group("name") in self.native_tables:
            from lance_flink_spark.sources.lance_native import restore_dataset

            restore_dataset(
                self.native_tables[m.group("name")].root, int(m.group("v"))
            )
            self._reregister_native(m.group("name"))
            return None
        if m and self._in_catalog(m.group("name")):
            ds = self.catalog.load_table(self.database, m.group("name"))
            ds.restore(int(m.group("v")))
            self._register(m.group("name"))
            return None
        m = _SHOW_CREATE.match(sql)
        if m and m.group("name") in self.native_tables:
            name = m.group("name")
            nds = self.native_tables[name]
            schema = self._native_df(nds).schema  # plan-only, no job
            cols = ",\n  ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in schema.fields
            )
            stmt = (
                f"CREATE TABLE {name} (\n  {cols}\n) WITH "
                f"('connector' = 'lance', 'path' = '{nds.root}')"
            )
            return self.spark.createDataFrame(
                [(stmt,)], "create_statement string"
            )
        if m and self._in_catalog(m.group("name")):
            name = m.group("name")
            ds = self.catalog.load_table(self.database, name)
            schema = ds.read(self.spark).schema
            cols = ",\n  ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in schema.fields
            )
            opts = self.options.get(name)
            opt_pairs = [("connector", "lance")]
            if opts is not None:
                # every option the user declared (read.batch-size,
                # write.batch-size, write.*, index.*, ...) round-trips;
                # `declared` already excludes path/connector
                for k, v in sorted((opts.declared or opts.extra or {}).items()):
                    opt_pairs.append((k, v))
            with_clause = ", ".join(f"'{k}' = '{v}'" for k, v in opt_pairs)
            stmt = f"CREATE TABLE {name} (\n  {cols}\n) WITH ({with_clause})"
            return self.spark.createDataFrame(
                [(stmt,)], "create_statement string"
            )
        m = _SHOW_VERSIONS.match(sql)
        if m and m.group("name") in self.native_tables:
            # native manifest chain: version, fragment count, live rows
            nds = self.native_tables[m.group("name")]
            nds = type(nds)(nds.root)  # fresh manifest list
            rows = []
            for v in nds.versions():
                _f, frags, _ = nds._manifest(v)
                rows.append((int(v), len(frags), int(nds.live_row_count(v))))
            return self.spark.createDataFrame(
                rows, "version long, fragments long, live_rows long"
            )
        if m:
            vs = self.catalog.load_table(self.database, m.group("name"))._load_manifest()[
                "versions"
            ]
            return self.spark.createDataFrame(
                [
                    (v["version"], v["mode"], float(v["ts"]), bool(v.get("expired")))
                    for v in vs
                ],
                "version long, mode string, ts double, expired boolean",
            )
        m = _NATIVE_COUNT.match(sql)
        if m and m.group("tbl") in self.native_tables:
            # COUNT(*) on a native table: manifest + deletion files
            # only — no data page is opened, at any table size
            nds = self.native_tables[m.group("tbl")]
            v = int(m.group("v")) if m.group("v") else None
            n = nds.live_row_count(version=v)
            return self.spark.createDataFrame(
                [(n,)], f"{m.group('alias') or 'count(1)'} long"
            )
        m = _NATIVE_SELECT.match(sql)
        if m and m.group("tbl") in self.native_tables:
            pruned = self._native_pruned_select(m)
            if pruned is not None:
                return pruned
        m = _STREAM_OVER.match(sql)
        if m and " OVER " in sql.upper():
            lowered = self._try_stream_over(m)
            if lowered is not None:
                return lowered
        return self._query(sql)

    def _native_pruned_select(self, m: re.Match) -> DataFrame | None:
        """``SELECT <plain column list> FROM <native> [WHERE pred]``:
        re-plan the scan with the projection (plus every table column
        the predicate mentions) pushed into the per-fragment decode —
        the pruned columns' pages are never read. Returns None for
        shapes outside the subset ('*', expressions, aliases), which
        fall through to the full registered view."""
        nds = self.native_tables[m.group("tbl")]
        fields, _frags, _v = nds._manifest()
        all_cols = {f.name for f in fields}
        proj = [c.strip() for c in m.group("proj").split(",")]
        if not all(re.fullmatch(r"[A-Za-z_]\w*", c) for c in proj):
            return None
        if not set(proj) <= all_cols:
            return None  # let Spark raise its own unresolved-column error
        pred = m.group("pred")
        if pred and re.search(
            r"\b(ORDER|GROUP|LIMIT|HAVING|UNION|JOIN|SELECT)\b", pred, re.IGNORECASE
        ):
            return None  # trailing clauses: not a plain scan+filter
        need = list(dict.fromkeys(proj))
        if pred:
            # conservative superset: any table column whose name appears
            # as a word in the predicate is decoded too
            toks = set(re.findall(r"[A-Za-z_]\w*", pred))
            need += [c for c in sorted(all_cols & toks) if c not in need]
        df = self._native_df(nds, columns=need)
        if pred:
            df = df.filter(_rewrite_array_literals(pred))
        return df.select(*proj)

    @staticmethod
    def _over_shards(src, key: str) -> int | None:
        """Sharded grouping for the streaming OVER lowering: one
        Python/state round per shard instead of per key (over_agg.py
        r15) whenever the key column is integral — the packed shard
        state stores keys as int64; other key types keep the exact
        per-key path."""
        from pyspark.sql import types as T

        from lance_flink_spark.streaming.over_agg import default_key_shards

        dt = src.schema[key].dataType
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return default_key_shards()
        return None

    def _try_stream_over(self, m: re.Match) -> DataFrame | None:
        """Lower a bounded-preceding OVER statement onto the streaming
        stateful operators when (and only when) the FROM table is a
        registered STREAMING view — batch OVER falls through to Spark
        SQL untouched. Dialect subset (Flink's streaming OVER rules):

        - one window spec — ``WINDOW w AS (...)`` or identical inline
          ``OVER (...)`` specs — with PARTITION BY <key> ORDER BY <ts>
          and a frame of ``RANGE BETWEEN INTERVAL 'n' UNIT PRECEDING
          AND CURRENT ROW`` or ``ROWS BETWEEN n PRECEDING AND CURRENT
          ROW`` (Flink: streaming OVER must be trailing-bounded);
        - aggregates from COUNT/SUM/MIN/MAX/AVG over ONE value column
          (COUNT(*) allowed) — served by over_range_multi /
          over_rows_multi in one state pass — or a single LAG(v, n)
          (no frame clause) served by over_rows_lag;
        - plain projected columns: the key, the order column, and
          exactly one row-id column (rows are keyed (ts, id), Flink's
          deterministic order tiebreak). The emitted time column is
          ``ts_us`` (epoch micros — the operators' settled clock).

        Anything outside the subset raises rather than mis-parsing;
        returns None when the source is not streaming."""
        tbl = m.group("tbl")
        try:
            src = self.spark.table(tbl)
        except Exception:  # noqa: BLE001 - unknown table: Spark's error
            return None
        if not src.isStreaming:
            return None
        items = _split_top_level(m.group("proj"))
        plain, overs = [], []
        for it in items:
            om = _OVER_ITEM.match(it)
            if om:
                overs.append(om)
            else:
                plain.append(it)
        if not overs:
            return None
        # resolve the single window spec
        specs = set()
        for om in overs:
            if om.group("wref"):
                if m.group("wname") is None or om.group("wref").lower() != m.group(
                    "wname"
                ).lower():
                    raise ValueError(
                        f"streaming OVER: window {om.group('wref')!r} is not "
                        "the statement's WINDOW clause"
                    )
                specs.add(" ".join(m.group("wspec").split()).lower())
            else:
                specs.add(" ".join(om.group("inline").split()).lower())
        if len(specs) != 1:
            raise ValueError(
                "streaming OVER: all aggregates must share ONE window "
                f"spec, got {sorted(specs)}"
            )
        wm = _OVER_WSPEC.match(specs.pop())
        if not wm:
            raise ValueError(
                "streaming OVER: window must be PARTITION BY <k> ORDER "
                "BY <ts> [RANGE|ROWS BETWEEN <bound> PRECEDING AND "
                "CURRENT ROW]"
            )
        key, ts = wm.group("k"), wm.group("ts")
        bad = [c for c in plain if c.lower() not in (key.lower(), ts.lower())]
        if len(bad) != 1:
            raise ValueError(
                "streaming OVER: project the key, the order column, and "
                f"exactly one row-id column (got extra columns {bad})"
            )
        id_col = bad[0]
        aggs = [
            (o.group("agg").upper(), o.group("args").strip(), o.group("alias"))
            for o in overs
        ]
        if len(aggs) == 1 and aggs[0][0] == "LAG":
            from lance_flink_spark.streaming.over_agg import over_rows_lag

            if wm.group("frame"):
                raise ValueError("streaming LAG takes no frame clause")
            args = _split_top_level(aggs[0][1])
            val = args[0]
            n = int(args[1]) if len(args) > 1 else 1
            out = over_rows_lag(
                src, key_col=key, ts_col=ts, id_col=id_col,
                value_col=val, n_lag=n,
                key_shards=self._over_shards(src, key),
            )
            return out.select(
                F.col(key), F.col("event_id").alias(id_col), "ts_us",
                F.col("lag_v").alias(aggs[0][2]),
            )
        if any(a == "LAG" for a, _v, _al in aggs):
            raise ValueError(
                "streaming OVER: LAG cannot mix with frame aggregates"
            )
        vals = {v for _a, v, _al in aggs if v not in ("*", "")}
        if len(vals) != 1:
            raise ValueError(
                "streaming OVER: aggregates must share ONE value column "
                f"(got {sorted(vals)})"
            )
        val = vals.pop()
        frame, bound = wm.group("frame"), wm.group("bound")
        if not frame:
            raise ValueError(
                "streaming OVER aggregates need a trailing-bounded frame "
                "(RANGE/ROWS BETWEEN ... PRECEDING AND CURRENT ROW) — "
                "Flink's streaming OVER rule"
            )
        col_of = {
            "COUNT": "over_cnt", "SUM": "over_sum", "MIN": "over_min",
            "MAX": "over_max", "AVG": "over_avg",
        }
        if frame.upper() == "RANGE":
            im = _OVER_INTERVAL.match(bound.strip())
            if not im:
                raise ValueError(
                    f"streaming RANGE bound {bound!r} must be INTERVAL "
                    "'n' SECOND|MINUTE|HOUR|DAY"
                )
            ms = int(im.group("n")) * _INTERVAL_MS[im.group("u").lower()]
            from lance_flink_spark.streaming.over_agg import over_range_multi

            out = over_range_multi(
                src, key_col=key, ts_col=ts, id_col=id_col,
                value_col=val, preceding_ms=ms,
                key_shards=self._over_shards(src, key),
            )
        else:
            from lance_flink_spark.streaming.over_agg import over_rows_multi

            out = over_rows_multi(
                src, key_col=key, ts_col=ts, id_col=id_col,
                value_col=val, n_preceding=int(bound.strip()),
                key_shards=self._over_shards(src, key),
            )
        sel = [F.col(key), F.col("event_id").alias(id_col), F.col("ts_us")]
        for agg, _v, alias in aggs:
            sel.append(F.col(col_of[agg]).alias(alias))
        return out.select(*sel)

    def _explain(self, stmt: str):
        """``EXPLAIN [PLAN FOR] <query>`` — the Flink explain surface.
        Restricted to QUERIES (SELECT/WITH/VALUES/TABLE): building the
        plan for a query is side-effect-free (lazy DataFrame), whereas
        explaining DML would require executing it here. The returned
        single-row frame carries Spark's formatted plan — scan pushdown,
        exchanges, and codegen stages are all visible to the user."""
        head = stmt.split(None, 1)[0].upper() if stmt else ""
        if head not in ("SELECT", "WITH", "VALUES", "TABLE"):
            raise ValueError(
                "EXPLAIN supports queries (SELECT/WITH/VALUES/TABLE), "
                f"got {head or '<empty>'!r}"
            )
        df = self.execute(stmt)
        jqe = df._jdf.queryExecution()
        try:
            plan = self.spark._jvm.PythonSQLUtils.explainString(jqe, "formatted")
        except Exception:  # noqa: BLE001 - older/newer shims
            plan = jqe.toString()
        return self.spark.createDataFrame([(plan,)], "plan string")

    def _native_meta_view(self, tbl: str, kind: str) -> str | None:
        """Metadata tables over NATIVE Lance datasets — the manifest
        chain is the source of truth: ``t$history`` = one row per
        manifest version, ``t$files`` = the latest version's fragment
        files (physical rows, live rows after deletion masks, bytes),
        ``t$deletes`` = live per-fragment deleted offsets. Driver-side
        manifest/deletion-file reads only — no data pages."""
        import os as _os

        nds = self.native_tables[tbl]
        view = f"{tbl}__meta_{kind}"
        if kind == "history":
            rows = []
            for v in nds.versions():
                _f, frags, _ = nds._manifest(v)
                rows.append((v, len(frags), sum(fr.physical_rows for fr in frags)))
            self.spark.createDataFrame(
                rows, "version long, fragments long, physical_rows long"
            ).createOrReplaceTempView(view)
            return view
        if kind == "files":
            from lance_flink_spark.sources.lance_native import read_deletion_file

            _fields, frags, _v = nds._manifest()
            rows = []
            for fr in frags:
                dead = (
                    len(read_deletion_file(nds.root, fr))
                    if fr.deletion is not None
                    else 0
                )
                for f in fr.all_files():  # backfill files list too
                    p = _os.path.join(nds.root, "data", f.path)
                    rows.append(
                        (f.path, fr.physical_rows, fr.physical_rows - dead,
                         _os.path.getsize(p))
                    )
            self.spark.createDataFrame(
                rows, "file string, physical_rows long, live_rows long, bytes long"
            ).createOrReplaceTempView(view)
            return view
        if kind == "deletes":
            from lance_flink_spark.sources.lance_native import read_deletion_file

            _fields, frags, _v = nds._manifest()
            rows = []
            for fr in frags:
                if fr.deletion is not None:
                    for off in read_deletion_file(nds.root, fr):
                        rows.append((fr.path, int(off)))
            self.spark.createDataFrame(
                rows or [], "file string, pos long"
            ).createOrReplaceTempView(view)
            return view
        return None

    def _rewrite_meta_tables(self, sql: str) -> str:
        """Iceberg-style metadata tables for catalog tables:

        - ``t$files`` — one row per LIVE data file: (file, rows,
          bytes) from parquet footers (file-count-bounded driver work,
          zero data pages read);
        - ``t$history`` — the version log: (version, mode, ts,
          expired), the SHOW VERSIONS frame as a queryable relation;
        - ``t$deletes`` — one row per live deletion-vector tombstone:
          (file, pos), empty when none are live (Iceberg's
          positional-delete-files introspection analogue).
        """

        def sub(m: re.Match) -> str:
            tbl, kind = m.group("tbl"), m.group("kind")
            if tbl in self.native_tables:
                return self._native_meta_view(tbl, kind) or m.group(0)
            if not self._in_catalog(tbl):
                return m.group(0)
            ds: Dataset = self.catalog.load_table(self.database, tbl)
            view = f"{tbl}__meta_{kind}"
            if kind == "deletes":
                dvs = ds._live_dvs()
                if dvs:
                    self.spark.read.parquet(
                        *[fsio.join(ds.path, d) for d in dvs]
                    ).selectExpr(
                        "_file as file", "_pos as pos"
                    ).createOrReplaceTempView(view)
                else:
                    self.spark.createDataFrame(
                        [], "file string, pos long"
                    ).createOrReplaceTempView(view)
            elif kind == "history":
                vs = ds._load_manifest()["versions"]
                self.spark.createDataFrame(
                    [
                        (v["version"], v["mode"], float(v["ts"]), bool(v.get("expired")))
                        for v in vs
                    ],
                    "version long, mode string, ts double, expired boolean",
                ).createOrReplaceTempView(view)
            else:
                import pyarrow.parquet as pq

                rows = []
                for root in ds._live_paths():
                    names = (
                        [root]
                        if root.endswith(".parquet")
                        else [
                            fsio.join(root, n)
                            for n in fsio.listdir(root)
                            if n.endswith(".parquet")
                        ]
                    )
                    for p in names:
                        local = p
                        for pref in ("file://", "file:"):
                            if local.startswith(pref):
                                local = local[len(pref):]
                        import os as _os

                        md = pq.ParquetFile(local).metadata
                        rows.append(
                            (
                                ds._relpath(p),
                                md.num_rows,
                                int(_os.path.getsize(local)),
                            )
                        )
                self.spark.createDataFrame(
                    rows or [], "file string, rows long, bytes long"
                ).createOrReplaceTempView(view)
            return view

        return _META_TABLE.sub(sub, sql)

    def _rewrite_time_travel(self, sql: str) -> str:
        """Substitute ``t VERSION AS OF n`` / ``t FOR SYSTEM_TIME AS OF
        n`` references to catalog tables with a temp view pinned to
        that manifest version (plain Catalyst scan of the version's
        live files — pushdown intact). Non-catalog identifiers are left
        untouched, so Spark's own error surfaces for them."""

        def sub(m: re.Match) -> str:
            tbl = m.group("tbl")
            v_raw = m.group("v1") or m.group("v2")
            if tbl in self.native_tables:
                # native Lance tables time-travel through their own
                # manifest chain (every version = one manifest file)
                v = int(v_raw)
                view = f"{tbl}__v{v}"
                self._native_df(self.native_tables[tbl], version=v)\
                    .createOrReplaceTempView(view)
                return view
            if not self._in_catalog(tbl):
                return m.group(0)
            v = int(v_raw)
            view = f"{tbl}__v{v}"
            ds: Dataset = self.catalog.load_table(self.database, tbl)
            ds.read(self.spark, version=v).createOrReplaceTempView(view)
            return view

        return _TIME_TRAVEL.sub(sub, sql)

    # ---------- statements ----------

    def _create(self, name: str, if_not_exists: bool, cols: str, opts_str: str) -> None:
        exists = self.catalog.table_exists(self.database, name)
        if exists and not if_not_exists:
            # Flink/reference semantics: plain CREATE TABLE on an
            # existing table raises (TableAlreadyExistsException) —
            # never silently replaces visible data
            raise CatalogError(f"table {self.database}.{name} already exists")
        pre_opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", opts_str))
        if pre_opts.get("connector") == "datagen":
            return self._create_datagen(name, cols, pre_opts)
        # Flink upsert-table surface: PRIMARY KEY (k) NOT ENFORCED in
        # the column list (or WITH ('primary-key'='k')) switches
        # INSERT INTO from append to keyed upsert (see _insert)
        cols, pk = _extract_primary_key(cols)
        if pk is None:
            pk = pre_opts.get("primary-key")
        if pk:
            self.primary_keys[name] = pk
        schema = T._parse_datatype_string(
            f"struct<{_spark_ddl_types(_strip_comments(cols))}>"
        )
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", opts_str))
        if opts.get("connector", "lance") != "lance":
            raise ValueError(f"unsupported connector {opts.get('connector')!r}")
        table_opts = {k: v for k, v in opts.items() if k != "connector"}
        table_opts.setdefault("path", "")
        if self._try_native_table(name, table_opts.get("path", "")):
            return None
        dopts = DatasetOptions.from_options(table_opts)
        self.options[name] = dopts
        if exists:  # IF NOT EXISTS on an existing table: keep its data
            self._register(name)
            return None
        empty = self.spark.createDataFrame([], schema)
        self.catalog.create_table(self.database, name, empty, mode="errorifexists")
        self._register(name)
        return None

    def _ctas(self, m: re.Match) -> None:
        """Flink 1.17 CTAS parity: ``CREATE TABLE t [WITH (...)] AS
        SELECT ...`` — schema derived from the query, result written as
        the table's first version in one statement. The SELECT is
        planned by Catalyst like any other query (pushdown, AQE); only
        the committed write is new."""
        name = m.group("name")
        exists = self.catalog.table_exists(self.database, name)
        if exists:
            if m.group("ine"):
                self._register(name)
                return None
            raise CatalogError(f"table {self.database}.{name} already exists")
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or ""))
        if opts.get("connector", "lance") != "lance":
            raise ValueError(f"unsupported connector {opts.get('connector')!r}")
        table_opts = {k: v for k, v in opts.items() if k != "connector"}
        table_opts.setdefault("path", "")
        df = self.spark.sql(_rewrite_array_literals(m.group("select")))
        if table_opts.get("storage") == "native":
            # CTAS into a NATIVE Lance directory ('Lance File 2.0'
            # data files + protobuf manifests — sources/lance_native).
            # Round 14: fragments are written EXECUTOR-side
            # (write_dataset_distributed — the reference's LanceSink
            # task-write/coordinator-commit model), so a 100 TB result
            # exports to real Lance without a driver gate; the driver
            # only commits the manifest.
            from lance_flink_spark.sources.lance_native import (
                write_dataset_distributed,
            )

            path = table_opts.get("path")
            if not path:
                raise ValueError("native CTAS requires a 'path' option")
            write_dataset_distributed(path, df)
            if not self._try_native_table(name, path):
                raise RuntimeError(f"native CTAS at {path} failed to register")
            return None
        self.options[name] = DatasetOptions.from_options(table_opts)
        self.catalog.create_table(self.database, name, df, mode="errorifexists")
        self._register(name)
        return None

    def _copy_into(self, m: re.Match) -> DataFrame:
        """Bulk file ingestion (Delta COPY INTO shape): read the
        source with Spark's reader (reader options from WITH — e.g.
        'header'/'inferSchema' for CSV), align columns BY NAME to the
        target schema with casts, append as one new version. Returns a
        one-row (rows_loaded, version) status frame. The read is a
        plain distributed scan — Catalyst parallelism, no driver
        staging."""
        name, src, fmt = m.group("name"), m.group("src"), m.group("fmt").lower()
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or ""))
        # 'tag' = idempotency token (Dataset.write tag semantics): a
        # re-run of the same COPY INTO is a no-op — retry-safe loads
        tag = opts.pop("tag", None)
        reader = self.spark.read
        for k, v in opts.items():
            reader = reader.option(k, v)
        df = reader.format(fmt).load(src)
        ds: Dataset = self.catalog.load_table(self.database, name)
        target = ds.read(self.spark).schema
        missing = [f.name for f in target.fields if f.name not in df.columns]
        if missing:
            raise ValueError(
                f"COPY INTO {name}: source lacks columns {missing}"
            )
        aligned = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields]
        )
        if tag is not None and ds.find_tag(tag) is not None:
            return self.spark.createDataFrame(
                [(0, int(ds.find_tag(tag)))], "rows_loaded long, version long"
            )
        n = aligned.count()
        v = ds.write(aligned, mode="append", tag=tag)
        self._register(name)
        return self.spark.createDataFrame(
            [(int(n), int(v))], "rows_loaded long, version long"
        )

    def _vector_search(self, m: re.Match) -> DataFrame:
        """The reference's vector_search SQL function
        (LanceVectorSearchFunction, flink-sql-demo.sql:229):
        ``SELECT * FROM vector_search('t', 'embedding',
        ARRAY[...], k [, 'METRIC' [, 'filter']])``. Routes through a
        vector index built by CREATE INDEX when one exists under the
        table (options from the table's WITH clause apply:
        vector.nprobes / vector.ef / vector.refine-factor), else
        brute-force KNN with the distance+similarity SearchResult
        contract. A filter (the reference's search(query, k, filter)
        pre-filter) forces the brute path: exact pre-filter semantics
        — the top-k comes FROM the filtered set, which a post-filtered
        index probe cannot guarantee."""
        tbl, col = m.group("tbl"), m.group("col")
        vec = [float(x) for x in m.group("vec").split(",")]
        k = int(m.group("k"))
        metric = (m.group("metric") or "L2").lower()
        flt = m.group("filter")
        if tbl in self.native_tables:
            # native Lance table: manifest-registered IVF_FLAT indexes
            # (the no-codebook payload this subset decodes) serve
            # first; our sidecar index next; otherwise exact brute KNN
            # over the distributed scan — with a warning saying WHY a
            # registered index didn't serve (PQ/HNSW payloads, stale
            # fragment sets).
            import warnings

            from lance_flink_spark.operators.similarity import knn

            nds = self.native_tables[tbl]
            if flt is None:
                served = self._manifest_index_search(
                    nds, tbl, col, vec, k, metric
                )
                if served is not None:
                    return served
            # OUR sidecar index over the native table serves next
            # (exact pre-filter semantics force brute, like parquet)
            if flt is None:
                served = self._native_index_search(nds, col, vec, k, metric)
                if served is not None:
                    return served
            return knn(
                self._native_df(self.native_tables[tbl]),
                vec,
                k,
                vec_col=col,
                metric=metric,
                filter=flt,
            )
        if self._in_catalog(tbl):
            ds: Dataset = self.catalog.load_table(self.database, tbl)
        elif os.path.isdir(os.path.join(tbl, "_versions")):
            # a NATIVE dataset path (the reference's vector_search over
            # lance paths): exact brute KNN over the distributed scan
            from lance_flink_spark.operators.similarity import knn
            from lance_flink_spark.sources.lance_native import (
                LanceNativeDataset,
                read_distributed,
            )

            return knn(
                read_distributed(LanceNativeDataset(tbl), self.spark),
                vec,
                k,
                vec_col=col,
                metric=metric,
                filter=flt,
            )
        else:
            ds = Dataset(tbl)  # a dataset path, the reference's form
        idx_path = fsio.join(ds.path, "_vector_index", col)
        topts = self.options.get(tbl)
        opts = dict((topts.extra or {}) if topts else {})
        if flt is None and fsio.exists(fsio.join(idx_path, "_index_meta.json")):
            from lance_flink_spark.index.options import search_index_with_options

            opts.setdefault("index.type", "IVF_FLAT")
            opts["vector.metric"] = metric
            return search_index_with_options(self.spark, idx_path, vec, k, opts)
        from lance_flink_spark.operators.similarity import knn

        return knn(
            ds.read(self.spark), vec, k, vec_col=col, metric=metric, filter=flt
        )

    def _show_native_indexes(self, name: str) -> DataFrame:
        """SHOW INDEXES on a NATIVE Lance table: report what the
        manifest's IndexSection says the reference stack built
        (LanceIndexBuilder.java:40-95 persists IVF/PQ/HNSW INTO the
        dataset) — (column, using, version, fresh). The index PAYLOADS
        are the Lance library's own binary format (outside the
        subset), so these indexes inform but don't serve lookups;
        vector_search says so when it brute-forces past one."""
        import os as _os

        from lance_flink_spark.sources.lance_native import (
            read_index_section,
        )

        nds = self.native_tables[name]
        current = nds.versions()[-1]
        fields, _frags, _v = nds._manifest()
        by_id = {}
        for f in fields:
            by_id[f.fid] = f.name
            for c in f.children:
                by_id[c.fid] = f"{f.name}.{c.name}"
        mpath = _os.path.join(nds.root, "_versions", f"{current}.manifest")
        rows = []
        for ix in read_index_section(mpath):
            cols = ",".join(by_id.get(i, f"#{i}") for i in ix.field_ids)
            rows.append(
                (
                    cols,
                    ix.details_type or ix.name or "UNKNOWN",
                    int(ix.dataset_version),
                    ix.dataset_version == current,
                )
            )
        # OUR sidecar indexes (CREATE INDEX on the native table) list
        # alongside the library-built ones; fresh = the fragment set
        # is unchanged (delete-only drift still serves with masks)
        import json as _json

        sdir = _os.path.join(nds.root, "_vector_index_spark")
        _f2, frags, _v2 = nds._manifest()
        frag_ids = sorted(fr.frag_id for fr in frags)
        for col in sorted(_os.listdir(sdir)) if _os.path.isdir(sdir) else []:
            b = _os.path.join(sdir, col, "_native_binding.json")
            if not _os.path.exists(b):
                continue
            meta = _json.load(open(b))
            rows.append(
                (
                    col,
                    "SIDECAR_VECTOR",
                    int(meta["built_version"]),
                    meta["frag_ids"] == frag_ids,
                )
            )
        return self.spark.createDataFrame(
            rows or [], "column string, using string, version long, fresh boolean"
        )

    def _show_indexes(self, name: str) -> DataFrame:
        """Every index sidecar on the table: (column, using, version,
        fresh) — fresh=false means lookups will raise until rebuilt."""
        ds: Dataset = self.catalog.load_table(self.database, name)
        current = ds.versions()[-1]
        rows = []
        kinds = [
            ("_scalar_index", "SCALAR"),
            ("_bloom_index", "BLOOM"),
            ("_vector_index", "VECTOR"),
        ]
        for d, using in kinds:
            root = fsio.join(ds.path, d)
            if not fsio.exists(root):
                continue
            for col in fsio.listdir(root):
                meta_p = fsio.join(root, col, "META.json")
                vmeta_p = fsio.join(root, col, "_index_meta.json")
                if fsio.exists(meta_p):
                    v = int(fsio.read_json(meta_p)["version"])
                    rows.append((col, using, v, v == current))
                elif fsio.exists(vmeta_p):
                    # vector indexes aren't version-stamped against the
                    # table (they cover what they were built on; add()
                    # maintains them) — report as fresh
                    rows.append((col, using, current, True))
        return self.spark.createDataFrame(
            rows or [], "column string, using string, version long, fresh boolean"
        )

    def _drop_index(self, m: re.Match) -> None:
        """Remove an index sidecar (all builds for the column of the
        given family; default SCALAR)."""
        using = (m.group("using") or "SCALAR").upper()
        d = {
            "SCALAR": "_scalar_index",
            "BLOOM": "_bloom_index",
        }.get(using, "_vector_index")
        ds: Dataset = self.catalog.load_table(self.database, m.group("name"))
        path = fsio.join(ds.path, d, m.group("col"))
        if not fsio.exists(path):
            raise ValueError(
                f"no {using} index on {m.group('name')}({m.group('col')})"
            )
        fsio.delete(path)
        return None

    def _create_datagen(self, name: str, cols: str, opts: dict) -> None:
        """Flink's ``datagen`` testing connector (the reference demo's
        realtime_events, flink-sql-demo.sql:204-216): a generated table
        registered as a view.

        - ``fields.X.kind='sequence'`` with start/end → BOUNDED: one
          spark.range over the sequence (the demo's 1..1_000_000).
          ``rows-per-second`` is advisory in bounded mode (a batch
          engine reads the whole range; the knob exists for streams).
        - no bounded sequence → Spark's ``rate`` STREAMING source at
          ``rows-per-second``, value standing in for the sequence.
        - other columns synthesize deterministically from the sequence
          (md5-derived) so repeated reads agree: STRING of
          ``fields.X.length``, ARRAY<FLOAT> of 4, numeric uniform;
          ``c AS PROCTIME()`` → current_timestamp()."""
        fields: list[tuple[str, str]] = []
        for part in _split_top_level(_strip_comments(cols)):
            part = part.strip()
            mm = re.match(r"(\w+)\s+AS\s+PROCTIME\s*\(\s*\)\s*$", part, re.IGNORECASE)
            if mm:
                fields.append((mm.group(1), "PROCTIME"))
                continue
            nm, _, ty = part.partition(" ")
            fields.append((nm.strip(), ty.strip().upper()))
        seq = next(
            (
                (nm, int(opts[f"fields.{nm}.start"]), int(opts[f"fields.{nm}.end"]))
                for nm, _ in fields
                if opts.get(f"fields.{nm}.kind") == "sequence"
                and f"fields.{nm}.end" in opts
            ),
            None,
        )
        if seq is not None:
            nm0, start, end = seq
            base = self.spark.range(start, end + 1).withColumnRenamed("id", "__seq")
        else:
            rps = int(opts.get("rows-per-second", "10"))
            base = (
                self.spark.readStream.format("rate")
                .option("rowsPerSecond", rps)
                .load()
                .withColumn("__seq", F.col("value"))
            )
        out = []
        for nm, ty in fields:
            if opts.get(f"fields.{nm}.kind") == "sequence":
                st = int(opts.get(f"fields.{nm}.start", "0"))
                out.append((F.col("__seq") - F.lit(seq[1] if seq else 0) + F.lit(st)).alias(nm))
            elif ty == "PROCTIME":
                out.append(F.current_timestamp().alias(nm))
            elif ty.startswith("STRING") or ty.startswith("VARCHAR"):
                ln = int(opts.get(f"fields.{nm}.length", "16"))
                out.append(
                    F.substring(F.md5(F.concat(F.lit(nm), F.col("__seq").cast("string"))), 1, ln).alias(nm)
                )
            elif ty.startswith("ARRAY"):
                out.append(
                    F.expr(
                        f"transform(sequence(1, 4), i -> cast("
                        f"conv(substr(md5(concat('{nm}', __seq, i)), 1, 4), 16, 10) "
                        f"/ 65535.0 as float))"
                    ).alias(nm)
                )
            elif ty.startswith(("DOUBLE", "FLOAT")):
                out.append(
                    (F.conv(F.substring(F.md5(F.concat(F.lit(nm), F.col("__seq").cast("string"))), 1, 8), 16, 10).cast("double") / 4294967295.0).alias(nm)
                )
            else:  # integral default: uniform from the hash
                out.append(
                    F.conv(F.substring(F.md5(F.concat(F.lit(nm), F.col("__seq").cast("string"))), 1, 8), 16, 10).cast("long").alias(nm)
                )
        base.select(*out).createOrReplaceTempView(name)
        return None

    def _create_index(self, m: re.Match) -> DataFrame:
        """SQL index builds over the existing builders: SCALAR (the
        BTREE/BITMAP sidecar, default), BLOOM (high-cardinality
        equality), or any vector index type via the option surface.
        Returns a one-row status frame (table, column, using,
        version)."""
        name, col = m.group("name"), m.group("col")
        using = (m.group("using") or "SCALAR").upper()
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or ""))
        ds: Dataset = self.catalog.load_table(self.database, name)
        if using == "SCALAR":
            v = ds.build_scalar_index(self.spark, col)
        elif using == "BLOOM":
            v = ds.build_bloom_index(
                self.spark, col, fpp=float(opts.get("fpp", "0.01"))
            )
        else:
            from lance_flink_spark.index.options import build_index_from_options

            # BOUND build (df=None + dataset=): the index stores row
            # addresses, so a later SQL DELETE/UPDATE on the table is
            # immediately visible to vector_search (tombstoned rows
            # masked at query time, Lance deletion-file parity)
            build_index_from_options(
                self.spark,
                None,
                fsio.join(ds.path, "_vector_index", col),
                {**opts, "index.type": using, "index.column": col},
                dataset=ds,
            )
            v = ds.versions()[-1]
        return self.spark.createDataFrame(
            [(name, col, using, int(v))],
            "table string, column string, using string, version long",
        )

    def build_index(self, name: str, path: str | None = None):
        """Build the vector index declared by the table's WITH options
        (index.* / vector.* — LanceOptions.java:118-238). The reference
        builds indexes through LanceIndexBuilder using the same option
        strings; here it is an explicit engine call so index builds are
        scheduled deliberately (they scan the full table)."""
        from lance_flink_spark.index.options import build_index_from_options
        from lance_flink_spark.sources import fsio

        opts = self.options.get(name)
        if opts is None or not opts.extra:
            raise ValueError(f"table {name} declares no index.*/vector.* options")
        ds = self.catalog.load_table(self.database, name)
        path = path or fsio.join(self.catalog._table_path(self.database, name), "_index")
        # bound build: later DELETE/UPDATE on the table masks search
        return build_index_from_options(
            self.spark, None, path, opts.extra, dataset=ds
        )

    def _alter_add(self, m: re.Match) -> None:
        """Flink ALTER TABLE ... ADD (col type, ...) — Lance add-column
        semantics: commit an empty fragment carrying the widened schema;
        mergeSchema reads surface the new columns as NULL on all
        existing rows. Metadata-cost only (no data rewritten)."""
        name = m.group("name")
        ds: Dataset = self.catalog.load_table(self.database, name)
        old = ds.read(self.spark).schema
        added = T._parse_datatype_string(
            f"struct<{_spark_ddl_types(_strip_comments(m.group('cols')))}>"
        )
        dropped = set(ds._dropped_cols())
        for f in added.fields:
            if f.name in old.names:
                raise CatalogError(f"column {f.name!r} already exists in {name}")
            if f.name in dropped:
                # name-based parquet schema merging would resurface the
                # dropped column's old bytes under the "new" column
                raise CatalogError(
                    f"column {f.name!r} was dropped from {name}; rewrite the "
                    "table (OPTIMIZE) before reusing the name"
                )
        widened = T.StructType(old.fields + added.fields)
        ds.write(self.spark.createDataFrame([], widened), mode="append")
        self._register(name)
        return None

    def _analyze(self, name: str, all_columns: bool = False):
        """``ANALYZE TABLE t COMPUTE STATISTICS [FOR ALL COLUMNS]`` —
        exact row count (parquet-footer metadata job, no data read) +
        live byte size (file-count-bounded listings), stored in the
        manifest and version-stamped. FOR ALL COLUMNS adds per-column
        null counts, approx NDV, and min/max (atomic types) in ONE
        aggregate pass — the CBO inputs Delta/Spark column stats carry.
        ``DESCRIBE EXTENDED`` surfaces them; external planners (or
        ``registry.bcast``-style gates) can read ``manifest['stats']``
        instead of estimating."""
        from pyspark.sql import types as T

        from lance_flink_spark.sources import fsio

        ds: Dataset = self.catalog.load_table(self.database, name)
        df = ds.read(self.spark)
        col_stats = {}
        if all_columns:
            atomic = [
                f for f in df.schema.fields
                if isinstance(f.dataType, (T.NumericType, T.StringType,
                                           T.DateType, T.TimestampType,
                                           T.TimestampNTZType, T.BooleanType))
            ]
            aggs = []
            for f in atomic:
                c = f.name
                aggs += [
                    F.count(F.when(F.col(c).isNull(), 1)).alias(f"__n_{c}"),
                    F.approx_count_distinct(c).alias(f"__d_{c}"),
                    F.min(c).cast("string").alias(f"__lo_{c}"),
                    F.max(c).cast("string").alias(f"__hi_{c}"),
                ]
            if aggs:
                row = df.agg(*aggs).first()
                for f in atomic:
                    c = f.name
                    col_stats[c] = {
                        "null_count": int(row[f"__n_{c}"]),
                        "approx_ndv": int(row[f"__d_{c}"]),
                        "min": row[f"__lo_{c}"],
                        "max": row[f"__hi_{c}"],
                    }
        rows = df.count()
        nbytes = 0
        physical = 0
        local = not fsio.is_remote(ds.path)
        frags, removed = ds._live_state()
        for frag in frags:
            for fname in fsio.listdir(frag):
                if not fname.endswith(".parquet"):
                    continue
                p = fsio.join(frag, fname)
                if ds._relpath(p) in removed:
                    continue
                nbytes += fsio.file_size(p)
                if local:
                    # footer-only physical row count: with deletion
                    # vectors the file bytes include tombstoned rows,
                    # so the live-byte estimate below scales by the
                    # live fraction (rows / physical)
                    import pyarrow.parquet as pq

                    physical += pq.ParquetFile(p).metadata.num_rows
        live_bytes = (
            int(nbytes * rows / physical) if physical else int(nbytes)
        )
        man = ds._load_manifest()
        man["stats"] = {
            "rows": int(rows),
            "bytes": int(nbytes),
            "physical_rows": int(physical),
            "live_bytes": live_bytes,
            **({"columns": col_stats} if col_stats else {}),
            "version": len(man.get("versions", [])),
        }
        fsio.write_json_atomic(ds._manifest_path(), man)
        return self.spark.createDataFrame(
            [(int(rows), int(nbytes))], "rows long, bytes long"
        )

    def _create_mv(self, m: re.Match) -> None:
        """``CREATE MATERIALIZED VIEW mv WITH ('key'='id') AS SELECT
        g1[, g2], SUM(v) FROM t GROUP BY ...`` — the Flink
        continuous-query analogue: the aggregate is computed once,
        stored, and each ``REFRESH MATERIALIZED VIEW mv`` folds only
        the source's CDF deltas since the last refresh into the state
        (sources/matview.py). Exposed as a queryable view with columns
        (group cols, sum_v, cnt, avg_v)."""
        from lance_flink_spark.sources.matview import MaterializedAggregate

        name = m.group("name")
        src = m.group("src")
        if not self._in_catalog(src):
            raise CatalogError(f"materialized-view source {src!r} not in catalog")
        opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("opts") or ""))
        if "key" not in opts:
            raise ValueError(
                "CREATE MATERIALIZED VIEW requires WITH ('key'='<row id col>') "
                "— the change-feed row identity"
            )
        mv = MaterializedAggregate(
            self.catalog.load_table(self.database, src),
            fsio.join(self.catalog._table_path(self.database, src), "_mv", name),
            row_key=opts["key"],
            group_cols=[c.strip() for c in m.group("grps").split(",")],
            value_col=m.group("val"),
        )
        self.matviews[name] = mv
        return self._refresh_mv(name)

    def _refresh_mv(self, name: str):
        mv = self.matviews.get(name)
        if mv is None:
            raise CatalogError(f"unknown materialized view {name!r}")
        mv.refresh(self.spark)
        mv.read(self.spark).createOrReplaceTempView(name)
        return None

    def _alter_drop(self, m: re.Match) -> None:
        """Flink/Delta ALTER TABLE ... DROP (col, ...) — Lance
        drop-column semantics via Dataset.drop_columns: metadata-only
        commit, reads project the columns away, bytes reclaimed at the
        next rewrite. Earlier versions stay time-travelable WITH the
        column."""
        name = m.group("name")
        cols = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        ds: Dataset = self.catalog.load_table(self.database, name)
        ds.drop_columns(self.spark, cols)
        self._register(name)
        return None

    def _delete(self, m: re.Match) -> None:
        """Flink 1.17 batch DELETE parity: ``DELETE FROM t [WHERE p]``.
        Routed to Dataset.delete_where — a fragment-pruned rewrite
        committing a new version (old versions stay time-travelable).
        A table declared WITH ('delete.mode'='deletion-vector') takes
        the tombstone path instead: no data files rewritten, cost ∝
        deleted rows (Lance deletion-file semantics)."""
        name = m.group("name")
        pred = m.group("pred")
        if name in self.native_tables:
            return self._delete_native(name, pred)
        ds: Dataset = self.catalog.load_table(self.database, name)
        ds.delete_where(
            self.spark,
            _rewrite_array_literals(pred) if pred else "true",
            dv=self._dv_mode(name),
        )
        self._register(name)
        return None

    def _update(self, m: re.Match) -> None:
        """Flink 1.17 batch UPDATE parity:
        ``UPDATE t SET c = expr [, ...] [WHERE p]``."""
        name = m.group("name")
        pred = m.group("pred")
        assignments: dict[str, str] = {}
        for part in _split_top_level(m.group("sets")):
            col, eq, expr = part.partition("=")
            if not eq or not col.strip().isidentifier():
                raise ValueError(f"malformed SET clause near {part!r}")
            assignments[col.strip()] = _rewrite_array_literals(expr.strip())
        if name in self.native_tables:
            return self._update_native(name, assignments, pred)
        ds: Dataset = self.catalog.load_table(self.database, name)
        ds.update_where(
            self.spark,
            _rewrite_array_literals(pred) if pred else "true",
            assignments,
            dv=self._dv_mode(name),
        )
        self._register(name)
        return None

    def _dv_mode(self, name: str) -> bool:
        """True when the table was declared WITH
        ('delete.mode'='deletion-vector') — DELETE/UPDATE/MERGE then
        take the tombstone (+ new-fragment) path instead of rewriting
        affected files."""
        opts = self.options.get(name)
        return (
            opts is not None
            and opts.declared.get("delete.mode") == "deletion-vector"
        )

    def _merge_when(self, m: re.Match) -> None:
        """Delta-style conditional MERGE: ordered WHEN clauses, first
        match wins per row. Conditions/SET expressions qualify columns
        as t.<col> (target) / s.<col> (source); the source query's
        columns align to the table schema by position, like the
        unconditional MERGE."""
        name = m.group("name")
        if name in self.native_tables:
            target = (
                self._native_df(self.native_tables[name]).schema
            )
        else:
            ds: Dataset = self.catalog.load_table(self.database, name)
            target = ds.read(self.spark).schema
        df = self.spark.sql(_rewrite_array_literals(m.group("src")))
        if len(df.columns) != len(target.fields):
            raise ValueError(
                f"MERGE arity {len(df.columns)} != table arity {len(target.fields)}"
            )
        aligned = df.select(
            *[
                F.col(f"`{c}`").cast(f.dataType).alias(f.name)
                for c, f in zip(df.columns, target.fields)
            ]
        )
        clauses = []
        for cm in _MERGE_CLAUSE.finditer(m.group("clauses")):
            not_matched = bool(cm.group("not_"))
            if cm.group("insert"):
                if not not_matched:
                    raise ValueError("INSERT requires WHEN NOT MATCHED")
                clauses.append(
                    {"matched": False, "cond": cm.group("cond"), "action": "insert",
                     "sets": None}
                )
            elif cm.group("delete"):
                clauses.append(
                    {"matched": True, "cond": cm.group("cond"), "action": "delete",
                     "sets": None}
                )
            else:
                sets = {}
                tgt_names = {f.name for f in target.fields}
                for part in _split_top_level(cm.group("sets")):
                    col, _, expr = part.partition("=")
                    col = col.strip()
                    # Delta-style qualified SET target (t.qty = ...):
                    # strip the target alias so the key matches the
                    # unqualified field name merge_when compares against
                    # — an unmatched key would be a silent no-op
                    if col.lower().startswith("t."):
                        col = col[2:].strip()
                    if col not in tgt_names:
                        raise ValueError(
                            f"MERGE SET target {col!r} is not a column of {name!r}"
                        )
                    sets[col] = expr.strip()
                clauses.append(
                    {"matched": True, "cond": cm.group("cond"), "action": "update",
                     "sets": sets}
                )
        if not clauses:
            raise ValueError("MERGE has no parseable WHEN clauses")
        if name in self.native_tables:
            return self._merge_when_native(
                name, aligned, m.group("on"), clauses
            )
        ds.merge_when(
            self.spark,
            aligned,
            on=m.group("on"),
            clauses=clauses,
            dv=self._dv_mode(name),
        )
        self._register(name)
        return None

    def _merge(self, m: re.Match) -> None:
        """``MERGE INTO t USING (<query>) ON key`` — the
        when-matched-update-all / when-not-matched-insert-all upsert
        (Lance merge_insert; Delta/Iceberg MERGE with implicit
        clauses). The source query's columns align to the table schema
        by position, like INSERT."""
        name = m.group("name")
        if name in self.native_tables:
            target = self._native_df(self.native_tables[name]).schema
        else:
            ds: Dataset = self.catalog.load_table(self.database, name)
            target = ds.read(self.spark).schema
        df = self.spark.sql(_rewrite_array_literals(m.group("src")))
        if len(df.columns) != len(target.fields):
            raise ValueError(
                f"MERGE arity {len(df.columns)} != table arity {len(target.fields)}"
            )
        aligned = df.select(
            *[
                # backticks: a positional source column may be NAMED
                # after its literal ("222.0") — a bare F.col would
                # parse the dot as struct access
                F.col(f"`{c}`").cast(f.dataType).alias(f.name)
                for c, f in zip(df.columns, target.fields)
            ]
        )
        if name in self.native_tables:
            # merge_insert == the two implicit clauses
            return self._merge_when_native(
                name,
                aligned,
                m.group("on"),
                [
                    {"matched": True, "cond": None, "action": "update",
                     "sets": {f.name: f"s.`{f.name}`" for f in target.fields}},
                    {"matched": False, "cond": None, "action": "insert",
                     "sets": None},
                ],
            )
        ds.merge_insert(
            self.spark, aligned, on=m.group("on"), dv=self._dv_mode(name)
        )
        self._register(name)
        return None

    def _insert(self, m: re.Match) -> None:
        name, rest = m.group("name"), m.group("rest").strip()
        overwrite = m.group("mode").upper() == "OVERWRITE"
        if rest.upper().startswith("VALUES"):
            df = self.spark.sql(f"SELECT * FROM {_rewrite_array_literals(rest)}")
        else:
            df = self.spark.sql(_rewrite_array_literals(rest))
        if name in self.native_tables:
            return self._insert_native(name, overwrite, df)
        target = self.catalog.load_table(self.database, name).read(self.spark).schema
        # align by position, cast to the table schema (Flink INSERT rules)
        if len(df.columns) != len(target.fields):
            raise ValueError(
                f"INSERT arity {len(df.columns)} != table arity {len(target.fields)}"
            )
        aligned = df.select(
            *[
                F.col(f"`{c}`").cast(f.dataType).alias(f.name)
                for c, f in zip(df.columns, target.fields)
            ]
        )
        opts = self.options.get(name)
        ds: Dataset = self.catalog.load_table(self.database, name)
        pk = self.primary_keys.get(name)
        if pk and not overwrite:
            # PRIMARY KEY table: INSERT INTO is an UPSERT (Flink
            # upsert-sink semantics — the sink materializes latest
            # state per key). With a declared 'sequence-field' the
            # batch folds to its newest row per key first and the
            # update clause is last-writer-wins guarded, so
            # out-of-order loads cannot clobber newer state; without
            # one, duplicate keys in one INSERT are refused loudly
            # (merge_when's dup probe) — batch order is undefined.
            seq = opts.declared.get("sequence-field") if opts else None
            src = aligned
            guard = None
            if seq:
                # comma-separated = composite sequence (lexicographic),
                # e.g. 'ts,event_id' for a tie-broken event-time order
                from lance_flink_spark.streaming.upsert import _seq_guard

                seq_cols = [c.strip() for c in seq.split(",")]
                w = Window.partitionBy(pk).orderBy(
                    *[F.col(c).desc() for c in seq_cols]
                )
                src = (
                    aligned.withColumn("__rn", F.row_number().over(w))
                    .filter("__rn = 1")
                    .drop("__rn")
                )
                guard = _seq_guard(seq_cols)
            clauses = [
                {
                    "matched": True,
                    "cond": guard,
                    "action": "update",
                    "sets": {
                        f.name: f"s.`{f.name}`"
                        for f in target.fields
                        if f.name != pk
                    },
                },
                {"matched": False, "cond": None, "action": "insert"},
            ]
            ds.merge_when(
                self.spark,
                src,
                on=pk,
                clauses=clauses,
                dv=self._dv_mode(name),
                # the seq fold above keeps exactly one row per key, so
                # the dup probe is structurally redundant; without a
                # sequence-field it must stay (loud refusal contract)
                assume_unique_keys=bool(seq),
            )
            self._register(name)
            return None
        ds.write(
            aligned,
            mode="overwrite" if overwrite else "append",
            max_rows_per_file=opts.write_max_rows_per_file if opts else 1_000_000,
            sort_by=opts.write_sort_by if opts else None,
            zorder_by=opts.write_zorder_by if opts else None,
            compression=opts.write_compression if opts else None,
            # only when declared: the parquet default page sizing is
            # the right answer unless the user asked for the knob
            batch_size=(
                opts.write_batch_size
                if opts and "write.batch-size" in opts.declared
                else None
            ),
        )
        self._register(name)
        return None
