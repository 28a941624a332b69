"""Executed sweep of the reference's YAML corpus (VERDICT r10 item 2).

Every ok/error case of the reference's 17 ``src/sql/*_tests.yaml``
files is executed through ``keenwa_spark.yaml_sweep`` — verbatim
cross-engine compares, strict-engine rejections, mechanical
translations, and documented divergences (superset / we_reject lanes).
The committed YAML_MAP.md is the generated mapping; this test re-runs
the sweep live so the mapping can never go stale silently.

Skips when the reference tree is absent (the queries are read from it
at runtime and are not stored in this repo).
"""

from __future__ import annotations

import os
import re

import pytest

from keenwa_spark import yaml_sweep as ys

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ys.REFERENCE_SQL_DIR),
    reason="reference YAML corpus not available",
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sweep_results(spark):
    return ys.run_sweep(spark)


def test_every_yaml_case_passes_its_lane(sweep_results):
    fails = [r for r in sweep_results if r.status != "pass"]
    assert not fails, "\n".join(f"{r.uid} [{r.lane}] {r.detail}" for r in fails)


def test_sweep_is_total(sweep_results):
    """Every parsed reference case gets exactly one result — zero
    unmapped cases (the VERDICT item's done-condition)."""
    cases = ys.load_reference_cases()
    assert len(cases) == len(sweep_results)
    assert {c.uid for c in cases} == {r.uid for r in sweep_results}
    # the corpus is the full 17-file set, not a subset
    assert len({c.file for c in cases}) == 17
    assert len(cases) >= 328


def test_divergences_are_bounded_and_annotated(sweep_results):
    """Divergence lanes stay the documented exception, not the rule,
    and every divergence carries a note (and we_reject an artifact or
    note pointing at the supported alternative)."""
    lanes: dict[str, int] = {}
    for r in sweep_results:
        lanes[r.lane] = lanes.get(r.lane, 0) + 1
    n = len(sweep_results)
    assert lanes.get("verbatim", 0) + lanes.get("reject", 0) >= 0.75 * n
    for r in sweep_results:
        if r.lane in ("superset", "we_reject", "translated"):
            assert r.note, f"{r.uid} lane {r.lane} lacks a note"


def test_committed_map_matches_live_sweep(sweep_results):
    """YAML_MAP.md was regenerated after the last sweep change."""
    path = os.path.join(REPO_ROOT, "YAML_MAP.md")
    assert os.path.exists(path), "YAML_MAP.md missing — run tools/yaml_corpus_map.py"
    text = open(path).read()
    m = re.search(r"\*\*(\d+) cases, (\d+) failing\.\*\*", text)
    assert m, "summary line missing from YAML_MAP.md"
    assert int(m.group(1)) == len(sweep_results)
    assert int(m.group(2)) == 0
    # every case uid appears in the committed table
    for r in sweep_results:
        assert f"`{r.uid}`" in text


def test_interval_parser_agrees_with_reference_decompositions():
    """The local interval parser (the sweep's oracle) reproduces the
    reference's own pretty-printed decompositions for every ok-case
    (e.g. '10-1' YEAR TO MONTH == 10 YEARS 1 MONTHS == 121 months)."""
    import yaml

    path = os.path.join(ys.REFERENCE_SQL_DIR, "expr_interval_tests.yaml")
    n_checked = 0
    with open(path) as fh:
        for doc in yaml.safe_load_all(fh):
            if not doc or "query" not in doc or "ok" not in doc:
                continue
            lit = " ".join(str(doc["query"]).split())
            ref = str(doc["ok"]).strip()
            got = ys.parse_interval_literal(lit)
            assert got is not None, lit
            months, days, secs = got
            ym = re.match(r"(-?)(\d+) YEARS (\d+) MONTHS$", ref)
            ds = re.match(r"(-?)(\d+) DAYS (\d+) HOURS (\d+) MINUTES (\d+) SECONDS$", ref)
            if ym:
                sign = -1 if ym.group(1) == "-" else 1
                want = sign * (int(ym.group(2)) * 12 + int(ym.group(3)))
                assert (months, days, secs) == (want, 0, 0), (lit, ref, got)
            else:
                assert ds, f"unrecognized ref decomposition {ref!r}"
                sign = -1 if ds.group(1) == "-" else 1
                d, h, mi, s = (int(ds.group(i)) for i in range(2, 6))
                want = (0, sign * d, sign * (h * 3600 + mi * 60 + s))
                assert (months, days, secs) == want, (lit, ref, got)
            n_checked += 1
    assert n_checked >= 40


def test_sweep_gate_blocks_path_capable_text():
    """ADVICE r11 (medium): accepted lanes execute raw case text loaded
    from the UNTRUSTED reference tree on Spark and DuckDB. The
    allowlist gate must refuse anything path-capable BEFORE either
    engine sees it; the live sweep above proves it blocks none of the
    328 real corpus cases."""
    blocked = [
        "SELECT * FROM text.`/etc/passwd`",                  # Spark format.`path`
        "SELECT * FROM `parquet`.`/root/testdata/sf0.001/orders.parquet`",
        "SELECT * FROM read_text('/etc/passwd')",            # DuckDB TVF
        "SELECT * FROM read_csv_auto('/etc/hostname')",
        "SELECT * FROM '/etc/passwd'",                       # DuckDB string relation
        "SELECT a1 FROM a JOIN '/tmp/x.csv' ON true",
        "SELECT glob('/root/*')",
        "INSTALL httpfs",                                    # non-query statement
        "COPY a TO '/tmp/out.csv'",
        "PRAGMA database_list",
        "ATTACH '/tmp/x.db'",
        "SELECT 1; SELECT 2",                                # multi-statement
        "SELECT getenv('HOME')",
        "SELECT java_method('java.lang.System', 'getenv')",  # Spark reflect
        # ADVICE r12 high: apostrophe inside a -- comment must not open
        # a phantom literal that swallows the read_csv call
        "SELECT * -- x'\nFROM read_csv('/etc/passwd')",
        "SELECT * /* y' */ FROM read_text('/etc/passwd')",
        # ADVICE r12 medium: SQL tokenizes FROM'/path' without a space
        "SELECT * FROM'/tmp/secret.csv'",
        "SELECT a1 FROM a JOIN'/tmp/x.csv' ON true",
        # DuckDB replacement scans also accept double-quoted path-like
        # identifiers as relations
        'SELECT * FROM "/tmp/secret.csv"',
    ]
    for sql in blocked:
        with pytest.raises(ValueError, match="sweep gate"):
            ys.assert_sweep_safe(sql)
    # benign shapes sail through, including string literals in predicates
    for sql in [
        "SELECT a1, count(*) FROM a GROUP BY a1",
        "WITH t AS (SELECT 1 AS x) SELECT * FROM t",
        "VALUES (1, 'aBc'), (2, 'from ''quoted''')",
        "SELECT * FROM test WHERE s = 'aBc' AND i BETWEEN 1 AND 2;",
        "(SELECT 1) UNION ALL (SELECT 2)",
        # comment/literal interleavings that must NOT false-positive
        "SELECT a1 -- plain comment\nFROM a",
        "SELECT 'don''t from x' AS v FROM a JOIN b ON a.a1 = b.b1",
        "SELECT * /* c ' */ FROM a -- tail ' comment",
    ]:
        ys.assert_sweep_safe(sql)


def test_sweep_fail_details_are_clipped():
    """ADVICE r11: mismatch details flow into the committed YAML_MAP.md
    — live row values must be bounded before they reach it."""
    s = ys._clip([("x" * 500, 12345)])
    assert len(s) <= 83 and s.endswith("...")
    assert ys._clip((1, 2)) == "(1, 2)"
