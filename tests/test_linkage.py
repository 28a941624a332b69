"""Record-linkage (pipeline/linkage.py) semantics: blocking recall,
best-match tie-breaks, the unmatched path, block capping, and plan
shape (equi-join only, never a Cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from keenwa_spark.pipeline.linkage import fuzzy_link


def _link(dirty_df, clean_df, **kw):
    args = dict(
        dirty_id="id",
        dirty_name="name",
        clean_id="rid",
        clean_name="rname",
        block_len=4,
        max_dist=2,
        max_block=None,
    )
    args.update(kw)
    return fuzzy_link(dirty_df, clean_df, **args)


def _clean(spark):
    return spark.createDataFrame(
        [
            (1, "Jonathan Archer"),
            (2, "Kathryn Janeway"),
            (3, "Benjamin Sisko"),
            (4, "Beverly Crusher"),
        ],
        "rid long, rname string",
    )


def test_single_deletion_always_matches(spark):
    """A single in-body deletion keeps at least one of the two blocks
    intact, so every twin links back at distance 1."""
    clean = _clean(spark)
    dirty = spark.createDataFrame(
        [
            (10, "Jnathan Archer"),   # prefix edited -> suffix block survives
            (20, "Kathryn Janewy"),   # suffix edited -> prefix block survives
            (30, "Benjamin Siko"),    # body edited -> both survive
        ],
        "id long, name string",
    )
    rows = {r.d_id: r for r in _link(dirty, clean).collect()}
    assert rows[10].match_id == 1 and rows[10].distance == 1
    assert rows[20].match_id == 2 and rows[20].distance == 1
    assert rows[30].match_id == 3 and rows[30].distance == 1


def test_exact_match_distance_zero_and_case_fold(spark):
    clean = _clean(spark)
    dirty = spark.createDataFrame(
        [(10, "  JONATHAN ARCHER ")], "id long, name string"
    )
    [r] = _link(dirty, clean).collect()
    assert (r.match_id, r.distance) == (1, 0)
    assert r.d_name == "jonathan archer"


def test_unmatched_keeps_row_with_nulls(spark):
    clean = _clean(spark)
    dirty = spark.createDataFrame(
        [(10, "Zephram Cochrane")], "id long, name string"
    )
    [r] = _link(dirty, clean).collect()
    assert r.match_id is None and r.match_name is None and r.distance is None


def test_tiebreak_smallest_clean_id(spark):
    clean = spark.createDataFrame(
        [(7, "abcdefgh"), (3, "abcdefgx"), (9, "abcdefgy")],
        "rid long, rname string",
    )
    dirty = spark.createDataFrame([(1, "abcdefgz")], "id long, name string")
    [r] = _link(dirty, clean, max_dist=1).collect()
    # all three candidates are at distance 1 -> smallest rid wins
    assert (r.match_id, r.distance) == (3, 1)


def test_null_names_dropped_from_both_sides(spark):
    clean = spark.createDataFrame(
        [(1, "abcdefgh"), (2, None)], "rid long, rname string"
    )
    dirty = spark.createDataFrame(
        [(10, "abcdefgh"), (11, None)], "id long, name string"
    )
    rows = _link(dirty, clean).collect()
    assert [r.d_id for r in rows] == [10]


def test_max_block_cap_is_deterministic(spark):
    """With every name sharing both blocks, max_block=2 keeps only the
    two lowest clean ids as candidates — deterministic, not sampled."""
    clean = spark.createDataFrame(
        [(i, "aaaa0%d0bbbb" % i) for i in range(1, 6)],
        "rid long, rname string",
    )
    dirty = spark.createDataFrame([(10, "aaaa090bbbb")], "id long, name string")
    [r] = _link(dirty, clean, max_block=2).collect()
    assert r.match_id == 1  # rid 1 and 2 survive the cap; 1 wins ties
    [r2] = _link(dirty, clean, max_block=None).collect()
    assert r2.match_id == 1


def test_duplicate_input_rows_do_not_consume_block_cap(spark):
    """Duplicated (id, name) input rows must not count toward
    max_block (ADVICE r07 item 3): the blocked base deduplicates
    before capping, so a repeated low-id row can't evict a distinct
    higher-id candidate the dirty record actually matches."""
    clean = spark.createDataFrame(
        # rid 1 duplicated 4x; rid 2 is the only true match at dist<=2
        [(1, "aaaa no match here bbbb")] * 4
        + [(2, "aaaa target bbbb")],
        "rid long, rname string",
    )
    dirty = spark.createDataFrame([(10, "aaaa target bbbb")], "id long, name string")
    # cap=2: dedup keeps {rid 1, rid 2} in the block; without the
    # dedup the four copies of rid 1 fill the cap and evict rid 2
    [r] = _link(dirty, clean, max_block=2).collect()
    assert r.match_id == 2 and r.distance == 0


def test_multi_edit_can_escape_blocking(spark):
    """Edits in BOTH block windows defeat prefix+suffix blocking even
    within max_dist — the documented recall trade."""
    clean = spark.createDataFrame([(1, "abcdefghij")], "rid long, rname string")
    dirty = spark.createDataFrame([(10, "XbcdefghiX")], "id long, name string")
    [r] = _link(dirty, clean).collect()
    assert r.match_id is None


def test_plan_has_no_cartesian(spark):
    clean = _clean(spark)
    dirty = clean.select(
        F.col("rid").alias("id"), F.col("rname").alias("name")
    )
    plan = _link(dirty, clean)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
