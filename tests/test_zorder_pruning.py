"""Measured z-order file-skipping payoff (VERDICT r07 task 3).

The whole point of `operators/layout.zorder_layout` is that parquet footer
min/max stats prune scans on EVERY clustered dimension, not just the
leading one. These tests write the events table twice — z-ordered on
(event_id, user_id) vs lexicographically sorted on event_id — and measure
the skipping a selective second-dimension predicate gets:

- directly against the parquet footers (pyarrow reads the same row-group
  min/max stats Spark's parquet reader uses to skip), and
- through Spark itself: the FileSourceScan's `numOutputRows` metric after
  an executed filtered read counts rows in the row groups that SURVIVED
  pushdown pruning (the vectorized reader materializes surviving groups,
  then FilterExec trims rows), so z-layout < lex-layout is the actual
  input-metrics payoff, not an inference.

The measured shape at sf0.01 / 16 files: a user_id range predicate touches
~5/16 row groups under z-order vs 16/16 under the event_id sort (~3x fewer
rows read), while an event_id predicate pays the documented converse cost
(z touches ~5/16 where the dedicated sort touches 1/16). Numbers are
asserted as bounds, not exact counts — range-partition boundaries come
from reservoir sampling.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from seccosql_spark.operators.layout import zorder_layout

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16


def _row_group_hits(directory: str, col: str, lo: int, hi: int) -> dict:
    """Row groups / rows whose footer [min,max] intersects [lo,hi] — what a
    stats-pruning reader must touch."""
    tot_rg = hit_rg = tot_rows = hit_rows = 0
    for path in glob.glob(directory + "/*.parquet"):
        f = pq.ParquetFile(path)
        idx = f.schema_arrow.get_field_index(col)
        for i in range(f.metadata.num_row_groups):
            rg = f.metadata.row_group(i)
            st = rg.column(idx).statistics
            tot_rg += 1
            tot_rows += rg.num_rows
            if st.min <= hi and st.max >= lo:
                hit_rg += 1
                hit_rows += rg.num_rows
    return {"tot_rg": tot_rg, "hit_rg": hit_rg, "tot_rows": tot_rows, "hit_rows": hit_rows}


def _scan_metrics(spark, directory: str, predicate: str) -> dict:
    """Execute a filtered read and return the leaf FileSourceScan metrics."""
    df = spark.read.parquet(directory).filter(predicate)
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    out = {}
    it = scan.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder_pruning")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zdir, ldir = str(base / "z"), str(base / "lex")
    zorder_layout(ev, ["event_id", "user_id"], num_partitions=N_FILES).write.parquet(zdir)
    (
        ev.repartitionByRange(N_FILES, "event_id")
        .sortWithinPartitions("event_id")
        .write.parquet(ldir)
    )
    n_rows = ev.count()
    return zdir, ldir, n_rows


def test_zorder_prunes_second_dimension(spark, layouts):
    """The headline claim: a selective predicate on the NON-leading
    dimension reads a minority of row groups under z-order, and everything
    under the single-column sort."""
    zdir, ldir, n_rows = layouts
    z = _row_group_hits(zdir, "user_id", 100, 110)
    lex = _row_group_hits(ldir, "user_id", 100, 110)
    assert z["tot_rows"] == lex["tot_rows"] == n_rows
    assert lex["hit_rg"] == lex["tot_rg"]  # event_id sort: zero help on user_id
    assert z["hit_rg"] <= z["tot_rg"] // 2  # z-order: skips >= half the groups
    assert z["hit_rows"] <= 0.5 * n_rows
    # and through Spark's own input metrics: the executed scan materializes
    # only the surviving row groups
    zm = _scan_metrics(spark, zdir, "user_id BETWEEN 100 AND 110")
    lm = _scan_metrics(spark, ldir, "user_id BETWEEN 100 AND 110")
    assert lm["numOutputRows"] == n_rows
    assert zm["numOutputRows"] == z["hit_rows"] <= 0.5 * n_rows


def test_zorder_keeps_leading_dimension_pruning(spark, layouts):
    """The trade: the dedicated sort is better on ITS dimension, but
    z-order still skips a majority there too — both dimensions stay
    prunable, which no single-column sort achieves."""
    zdir, ldir, n_rows = layouts
    z = _row_group_hits(zdir, "event_id", 0, 600)
    lex = _row_group_hits(ldir, "event_id", 0, 600)
    assert lex["hit_rg"] <= 2  # the dedicated sort nails its own dimension
    assert z["hit_rg"] <= z["tot_rg"] // 2  # z still skips >= half
    assert z["hit_rows"] <= 0.5 * n_rows


def test_zorder_unnormalized_dims_do_not_prune(spark, layouts):
    """Regression pin for the bug this measurement exposed: WITHOUT
    per-dimension normalization, a wide dimension (14-bit event_id) owns
    every high z-bit and the narrow one (8-bit user_id) gets zero skipping
    — the layout silently degenerates to a single-column sort."""
    zdir, _, n_rows = layouts
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    raw = str(glob.os.path.dirname(zdir) + "/raw")
    zorder_layout(
        ev, ["event_id", "user_id"], num_partitions=N_FILES, normalize=False
    ).write.parquet(raw)
    hits = _row_group_hits(raw, "user_id", 100, 110)
    assert hits["hit_rg"] == hits["tot_rg"]  # no pruning at all
    # while the normalized layout (same data, same predicate) skips
    assert _row_group_hits(zdir, "user_id", 100, 110)["hit_rg"] <= N_FILES // 2
