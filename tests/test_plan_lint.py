"""Pins for plans/lint.py: each anti-pattern detector fires on a plan
constructed to exhibit it, and the engine's own flagship plans come back
clean."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from financial_big_data_spark.plans.lint import scale_lint


def _kinds(findings):
    return {f.kind for f in findings}


def test_flags_partitionless_window(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "partitionless-window" in _kinds(scale_lint(df, executed=False))


def test_flags_nested_loop_join(spark):
    a = spark.range(50).select(F.col("id").alias("x"))
    b = spark.range(50).select(F.col("id").alias("y"))
    theta = a.join(b, a.x < b.y)  # non-equi predicate -> BNLJ
    kinds = _kinds(scale_lint(theta, executed=False))
    assert kinds & {"nested-loop-join", "cartesian-join"}


def test_flags_row_python_udf(spark):
    @F.udf("long")
    def slow(v):
        return v + 1

    df = spark.range(10).select(slow(F.col("id")).alias("v"))
    assert "row-python-udf" in _kinds(scale_lint(df, executed=False))


def test_keyed_window_and_equi_join_are_clean(spark):
    a = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    w = Window.partitionBy("k").orderBy("v")
    df = a.withColumn("rn", F.row_number().over(w))
    b = spark.range(5).select(F.col("id").alias("k"), F.lit("d").alias("dim"))
    joined = df.join(b, on="k")
    findings = scale_lint(joined, executed=False)
    assert _kinds(findings) <= {"single-partition-exchange"}  # none expected
    assert "partitionless-window" not in _kinds(findings)


def test_engine_flagship_queries_are_clean(spark):
    """The bucketized range join and the interleave (two operators built
    specifically to avoid these anti-patterns) must lint clean."""
    import datetime as dt

    from financial_big_data_spark.operators.rangejoin import range_join
    from financial_big_data_spark.operators.sampling import interleave_sources

    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 7))], "fact_id long, t timestamp_ntz"
    )
    iv = spark.createDataFrame(
        [("w", dt.datetime(2024, 1, 1, 6), dt.datetime(2024, 1, 1, 18))],
        "iv_id string, s timestamp_ntz, e timestamp_ntz",
    )
    rj = range_join(facts, iv, "t", "s", "e")
    bad = {"partitionless-window", "cartesian-join", "nested-loop-join", "row-python-udf"}
    assert not (_kinds(scale_lint(rj, executed=False)) & bad)

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(20)], "doc_id long, source string"
    )
    mix = interleave_sources(docs, {"a": 2.0, "b": 1.0})
    assert not (_kinds(scale_lint(mix, executed=False)) & bad)


def test_round10_operators_lint_clean(spark):
    """The new oracle-backed operators must not introduce any of the
    anti-patterns: SemDeDup's literal-fold assignment has no BNLJ and no
    per-row window; the stratified split's bucketed ranking has no
    partitionless window; Lloyd assignment is map-only."""
    from financial_big_data_spark.ml.clustering import lloyd_kmeans
    from financial_big_data_spark.operators.sampling import stratified_split
    from financial_big_data_spark.operators.similarity import semdedup

    bad = {"partitionless-window", "cartesian-join", "nested-loop-join", "row-python-udf"}

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    assert not (_kinds(scale_lint(semdedup(emb, n_clusters=4), executed=False)) & bad)
    assert not (_kinds(scale_lint(lloyd_kmeans(emb, k=3, n_iter=2), executed=False)) & bad)

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    split = stratified_split(docs, strata="source", id_col="doc_id")
    assert not (_kinds(scale_lint(split, executed=False)) & bad)


def test_self_join_sweep_catches_two_line_alias_idiom(tmp_path):
    """VERDICT r10 #2: the source sweep must flag BOTH alias idioms — the
    two-line `a = Z.alias(\"a\")` / `b = Z.alias(\"b\")` form evaded the r5
    one-line regex. An unregistered site of either form fails the sweep."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from lint_report import _self_join_sites, _self_join_why

    (tmp_path / "evader.py").write_text(
        "def build_pairs(banded):\n"
        "    a = banded.alias(\"a\")\n"
        "    b = banded.alias(\"b\")\n"
        "    return a.join(b, on=[\"band\", \"key\"])\n"
    )
    (tmp_path / "oneline.py").write_text(
        "def build(slots):\n"
        "    a, b = slots.alias(\"a\"), slots.alias(\"b\")\n"
        "    return a.join(b, on=\"k\")\n"
    )
    (tmp_path / "not_self.py").write_text(
        "def ok(x, y):\n"
        "    a = x.alias(\"a\")\n"
        "    b = y.alias(\"b\")\n"  # different frames: not a self-join
        "    return a.join(b, on=\"k\")\n"
    )
    sites = _self_join_sites(str(tmp_path))
    by_file = {(s[0].split("/")[-1], s[2]) for s in sites}
    assert ("evader.py", "build_pairs") in by_file
    assert ("oneline.py", "build") in by_file
    assert all(f != "not_self.py" for f, _ in by_file)
    # unregistered -> no justification -> sweep exit 1 path
    assert _self_join_why("somewhere/evader.py", "build_pairs") is None


def test_self_join_sweep_repo_sites_all_justified():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from lint_report import _self_join_sites, _self_join_why

    for path, lineno, func in _self_join_sites():
        assert _self_join_why(path, func) is not None, (
            f"unjustified pair self-join at {path}:{lineno} ({func}) — "
            "bound its per-key expansion or register it in "
            "SELF_JOIN_JUSTIFIED"
        )


def test_self_join_sweep_catches_select_rename_idiom(tmp_path):
    """Round-11 widening: the `left = Z.select(...)` / `right = Z.select(...)`
    rename idiom (simhash_near_dups' shape) and two-line alias pairs split
    by comment blocks must both be visible to the sweep."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from lint_report import _self_join_sites

    (tmp_path / "sel.py").write_text(
        "def build(bands):\n"
        "    left = bands.select(\n"
        "        bands.x.alias(\"id_a\"),\n"
        "    )\n"
        "    right = bands.select(\n"
        "        bands.x.alias(\"id_b\"),\n"
        "    )\n"
        "    return left.join(right, on=\"k\")\n"
    )
    (tmp_path / "gap.py").write_text(
        "def build(z):\n"
        "    a = z.alias(\"a\")\n"
        "    # comment line 1\n"
        "    # comment line 2\n"
        "    # comment line 3\n"
        "    # comment line 4\n"
        "    # comment line 5\n"
        "    b = z.alias(\"b\")\n"
        "    return a.join(b, on=\"k\")\n"
    )
    by_file = {(s[0].split("/")[-1], s[2]) for s in _self_join_sites(str(tmp_path))}
    assert ("sel.py", "build") in by_file
    assert ("gap.py", "build") in by_file
