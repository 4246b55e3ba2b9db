"""Record linkage (operators/linkage.py): multi-pass blocking completeness
for single edits, candidate dedup, and verify semantics."""

from __future__ import annotations

from payroll_etl_fastapi_spark.operators import linkage as L


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_single_edit_never_lost_to_blocking_exhaustive(spark):
    """The completeness proof, exhaustively: for a length-8 name (≥ 2L with
    L=3), EVERY single-character deletion, substitution, and insertion
    still links back to the clean record."""
    base = "abcdefgh"
    dirty_rows = []
    i = 0
    for p in range(len(base)):  # deletions
        dirty_rows.append((100 + i, base[:p] + base[p + 1 :])); i += 1
    for p in range(len(base)):  # substitutions
        dirty_rows.append((100 + i, base[:p] + "z" + base[p + 1 :])); i += 1
    for p in range(len(base) + 1):  # insertions
        dirty_rows.append((100 + i, base[:p] + "z" + base[p:])); i += 1
    clean = _df(spark, [(1, base)])
    dirty = _df(spark, dirty_rows)
    got = L.blocked_edit_pairs(dirty, clean, "name", "id", max_distance=1)
    linked = {r["dirty_id"] for r in got.collect()}
    assert linked == {100 + k for k in range(i)}


def test_candidates_deduped_before_verify(spark):
    """A pair sharing BOTH block keys appears once in the output."""
    clean = _df(spark, [(1, "abcdef")])
    dirty = _df(spark, [(2, "abcdef")])  # shares prefix AND suffix key
    rows = L.blocked_edit_pairs(dirty, clean, "name", "id").collect()
    assert len(rows) == 1
    assert rows[0]["distance"] == 0


def test_beyond_threshold_and_disjoint_blocks_excluded(spark):
    clean = _df(spark, [(1, "abcdef"), (2, "uvwxyz")])
    dirty = _df(spark, [(3, "abcqqqdef"), (4, "qqqqqq")])
    # 3 shares keys with 1 but distance 3 > 2; 4 shares no block key
    assert L.blocked_edit_pairs(dirty, clean, "name", "id").count() == 0


def test_normalization_case_and_whitespace(spark):
    clean = _df(spark, [(1, "  Red Widget ")])
    dirty = _df(spark, [(2, "red widget")])
    rows = L.blocked_edit_pairs(dirty, clean, "name", "id").collect()
    assert len(rows) == 1 and rows[0]["distance"] == 0
