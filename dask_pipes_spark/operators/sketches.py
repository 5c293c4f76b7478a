"""Mergeable-sketch operators beyond the HLL family (d5/d22/d38).

Published grounding: count-min sketch — Cormode & Muthukrishnan 2005 ("An
improved data stream summary: the count-min sketch and its applications").

Unlike the HLL keys (whose estimates depend on Spark's internal HLL++
implementation and are therefore weak rows-only checks), the CMS here is
built from the PORTABLE md5-60bit digest (l2/l16 discipline), so the entire
sketch — every cell, every estimate — is bit-for-bit reproducible in DuckDB
and the key carries a full SQL oracle. That is the point of this module:
a *provably correct* sketch implementation, not a black-box one.

Scale notes (100 TB):
- The sketch build aggregates per-key counts FIRST (the same shuffle any
  exact count needs — partial map-side combine applies), then explodes only
  the distinct-key table by depth d=4. The fact table is never exploded.
- A CMS is a fixed-size (d×w) grid whatever the corpus size, and cells are
  pure SUMs — associative and mergeable, so partial sketches combine across
  partitions/days for free (the same property d22 demonstrates for HLL).
- Probe-side estimation is a broadcast join against the ≤d·w-row cell table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_pipes_spark.registry import query
from dask_pipes_spark.session import load

_W = 512  # sketch width (cells per row)
_D = 4  # sketch depth (hash rows)


def _cell(d_col, key_col):
    """Portable CMS cell index: md5-60bit of "<d>:<key>" mod width."""
    digest_in = F.concat(
        d_col.cast("string"), F.lit(":"), key_col.cast("string")
    )
    return F.pmod(
        F.conv(F.substring(F.md5(digest_in), 1, 15), 16, 10).cast("bigint"),
        F.lit(_W),
    )


_SQL_CELL = (
    "CAST(('0x' || substr(md5(CAST({d} AS VARCHAR) || ':' || "
    "CAST({k} AS VARCHAR)), 1, 15)) AS BIGINT) % 512"
)


@query(
    "d42_cms_topk",
    oracle=f"""
    WITH exact AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ),
    ds AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
    cells AS (
      SELECT ds.d, {_SQL_CELL.format(d='ds.d', k='e.l_partkey')} AS cell,
             SUM(e.cnt) AS cellcnt
      FROM exact e CROSS JOIN ds
      GROUP BY 1, 2
    ),
    probe AS (SELECT l_partkey, cnt FROM exact WHERE l_partkey % 97 = 0),
    probe_cells AS (
      SELECT p.l_partkey, p.cnt, ds.d,
             {_SQL_CELL.format(d='ds.d', k='p.l_partkey')} AS cell
      FROM probe p CROSS JOIN ds
    ),
    est AS (
      SELECT pc.l_partkey, MIN(c.cellcnt) AS cms_est
      FROM probe_cells pc JOIN cells c ON c.d = pc.d AND c.cell = pc.cell
      GROUP BY 1
    )
    SELECT e.l_partkey,
           CAST(p.cnt AS BIGINT) AS exact_cnt,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - p.cnt AS BIGINT) AS overcount
    FROM est e JOIN probe p ON e.l_partkey = p.l_partkey
    """,
)
def d42_cms_topk(spark, sf_dir):
    """Count-min sketch (Cormode & Muthukrishnan 2005) over lineitem part
    keys — depth 4 × width 512, portable md5-60bit row hashes — probed for
    a bounded key set (every 97th part key) and compared against the exact
    counts in the same result: ``cms_est >= exact_cnt`` always (one-sided
    error, asserted in tests), ``overcount`` shows the collision mass.
    Because the hashes are the portable digest, the WHOLE sketch is
    recomputed cell-for-cell by the DuckDB oracle — a sketch with a proof,
    unlike the engine-internal HLL keys (d5/d22) that can only be
    rows-only-checked.

    100 TB: per-key counts aggregate first (one shuffle with map-side
    combine — the sketch build itself adds NO fact-table pass), the d×w
    cell table is ≤2048 rows whatever the corpus (broadcast side of the
    probe join), and cells are plain SUMs, so per-partition / per-day
    partial sketches merge associatively (the d22 merge pattern applies
    unchanged)."""
    li = load(spark, sf_dir, "lineitem")
    # the per-key count feeds BOTH the cell build and the probe set; pin it
    # so the fact-table aggregate runs once, not once per consumer (lineage
    # truncation — the l18/l55 discipline)
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    ds = F.explode(F.array(*[F.lit(i) for i in range(_D)])).alias("d")
    keyed = exact.select("l_partkey", "cnt", ds)
    cells = (
        keyed.withColumn("cell", _cell(F.col("d"), F.col("l_partkey")))
        .groupBy("d", "cell")
        .agg(F.sum("cnt").alias("cellcnt"))
    )
    probe = exact.filter(F.col("l_partkey") % 97 == 0)
    probe_cells = probe.select("l_partkey", "cnt", ds).withColumn(
        "cell", _cell(F.col("d"), F.col("l_partkey"))
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("l_partkey")
        .agg(F.min("cellcnt").alias("cms_est"))
    )
    return est.join(probe, "l_partkey").select(
        "l_partkey",
        F.col("cnt").cast("bigint").alias("exact_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("bigint").alias("overcount"),
    )
