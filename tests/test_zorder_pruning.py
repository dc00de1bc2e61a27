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


def test_hilbert_curve_is_a_hamiltonian_path(spark):
    """The property that makes Hilbert worth having next to Morton:
    visiting cells in index order moves ONE step at a time (Manhattan
    distance 1, no jumps), i.e. the curve is a Hamiltonian path of the
    grid graph. Checked exhaustively on the full 8x8 grid; Morton provably
    fails this (its distance-1 pin would trip at every power-of-two
    boundary)."""
    from seccosql_spark.operators.layout import hvalue

    cells = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x LONG, y LONG"
    )
    got = {
        r["d"]: (r["x"], r["y"])
        for r in cells.select("x", "y", hvalue(F.col("x"), F.col("y"), bits=3).alias("d")).collect()
    }
    assert sorted(got) == list(range(64))  # a bijection onto 0..63
    walk = [got[d] for d in range(64)]
    assert all(
        abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1 for a, b in zip(walk, walk[1:])
    )
    assert walk[0] == (0, 0)


def test_hilbert_layout_prunes_both_dimensions(spark, layouts, tmp_path_factory):
    """The measured payoff, same harness as z-order: a selective predicate
    on EITHER dimension touches a minority of Hilbert row groups (the
    single-column sort reads everything on the non-leading one), and on
    the 2-D box probe Hilbert's tighter bounding rectangles touch no more
    rows than Morton's."""
    from seccosql_spark.operators.layout import hilbert_layout

    zdir, ldir, n_rows = layouts
    hdir = str(tmp_path_factory.mktemp("hilbert") / "h")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    hilbert_layout(ev, ["event_id", "user_id"], num_partitions=N_FILES).write.parquet(hdir)

    h_user = _row_group_hits(hdir, "user_id", 100, 110)
    assert h_user["tot_rows"] == n_rows
    assert h_user["hit_rg"] <= h_user["tot_rg"] // 2
    h_event = _row_group_hits(hdir, "event_id", 0, 600)
    assert h_event["hit_rg"] <= h_event["tot_rg"] // 2

    # 2-D box: Hilbert locality is at least as tight as Morton's on rows
    # actually read through Spark (row groups surviving BOTH column stats)
    box = "user_id BETWEEN 100 AND 140 AND event_id BETWEEN 0 AND 3000"
    hm = _scan_metrics(spark, hdir, box)
    zm = _scan_metrics(spark, zdir, box)
    assert hm["numOutputRows"] <= zm["numOutputRows"] * 1.25
    assert hm["numOutputRows"] < n_rows


def test_normalized_dims_survive_wide_spans(spark):
    """A raw epoch-microsecond-like column (span > 2^63/65535) must still
    normalize to [0, 65535] — the 64-bit rescale multiply silently wrapped
    negative before the DECIMAL(38,0) fix, corrupting both curve layouts
    with no error."""
    from seccosql_spark.operators.layout import _normalized_dims

    df = spark.createDataFrame(
        [(0,), (200_000_000_000_000,), (9_200_000_000_000_000_000,)], "t LONG"
    )
    (dim,) = _normalized_dims(df, ["t"], bits=16)
    vals = sorted(r[0] for r in df.select(dim).collect())
    assert vals[0] == 0 and vals[-1] == 65535
    assert all(0 <= v <= 65535 for v in vals)
