"""Edit-distance fuzzy join (PassJoin segment blocking) — exactness
vs brute force, adversarial shapes, and the no-cross-join plan gate.
Beyond the reference (tablite joins are exact-key only)."""
import random

import pytest
from pyspark.sql import functions as F

from tablite_spark.operators.fuzzy import fuzzy_join


def _brute(spark, df, d):
    return {(r["a"], r["b"]) for r in
            df.alias("x").crossJoin(df.selectExpr("w as w2").alias("y"))
            .select(F.col("w").alias("a"), F.col("w2").alias("b"),
                    F.levenshtein("w", "w2").alias("dd"))
            .filter(F.col("dd") <= d).collect()}


@pytest.mark.parametrize("d", [0, 1, 2])
@pytest.mark.slow
def test_fuzzy_join_matches_brute_force(spark, d):
    rnd = random.Random(5)
    base = ["table", "spark", "fuzzy", "join", "distance", "a", "ab",
            "", "record"]
    words = set()
    for w in base:
        words.add(w)
        for _ in range(6):
            x = list(w)
            op = rnd.choice(["ins", "del", "sub"])
            if op == "ins" or not x:
                x.insert(rnd.randrange(len(x) + 1), rnd.choice("abcdef"))
            elif op == "del":
                del x[rnd.randrange(len(x))]
            else:
                x[rnd.randrange(len(x))] = rnd.choice("abcdef")
            words.add("".join(x))
    df = spark.createDataFrame([(w,) for w in sorted(words)], "w string")
    got = {(r["l_id"], r["r_id"]) for r in
           fuzzy_join(df, df, "w", "w", max_distance=d).collect()}
    assert got == _brute(spark, df, d)


def test_fuzzy_join_shared_prefix_and_ids(spark):
    """Customer#-style shared prefixes (hot blocking keys) must stay
    exact; distinct id columns ride through."""
    rows = [(i, f"Customer#{i:04d}") for i in range(50)]
    df = spark.createDataFrame(rows, "cid long, name string")
    out = fuzzy_join(df, df, "name", "name", max_distance=1,
                     left_id="cid", right_id="cid").collect()
    got = {(r["l_id"], r["r_id"]) for r in out}
    # distance<=1 == ids whose 4-digit forms differ in <=1 position
    want = {(i, j) for i in range(50) for j in range(50)
            if sum(a != b for a, b in
                   zip(f"{i:04d}", f"{j:04d}")) <= 1}
    assert got == want
    assert all(r["dist"] in (0, 1) for r in out)


def test_fuzzy_join_no_cross_join_in_plan(spark):
    """The candidate stage must be an equi join on segment keys —
    never a cartesian/BNL product."""
    df = spark.createDataFrame([("abc",), ("abd",)], "w string")
    plan = fuzzy_join(df, df, "w", "w", 1)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_fuzzy_join_nulls_dropped(spark):
    df = spark.createDataFrame([("abc",), (None,)], "w string")
    out = fuzzy_join(df, df, "w", "w", 1).collect()
    assert {(r["l_val"], r["r_val"]) for r in out} == {("abc", "abc")}


def test_trigram_substring_search(spark, tmp_path):
    """pg_trgm-style substring search: inline AND durable-index paths
    must equal brute-force LIKE, including the scattered-trigram
    false-positive case the confirm join exists for."""
    from tablite_spark.pipeline.retrieval import (
        build_trigram_index, load_trigram_index, substring_search,
    )
    rows = [(1, "the table stands"), (2, "tablets on the shelf"),
            # contains every trigram of "table" (tab/abl/ble) but NOT
            # the substring itself -> candidate, killed by confirm
            (3, "tabx ably blez"),
            (4, "table table table"), (5, ""), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(1, 1), (2, 1), (4, 3)}
    got = {(r["doc_id"], r["n_occurrences"]) for r in
           substring_search(df, "text", "doc_id", "table").collect()}
    assert got == want
    idx_path = str(tmp_path / "trgm")
    build_trigram_index(df, "text", "doc_id", idx_path)
    idx, tri_df = load_trigram_index(spark, idx_path)
    got2 = {(r["doc_id"], r["n_occurrences"]) for r in
            substring_search(df, "text", "doc_id", "table",
                             postings=idx).collect()}
    assert got2 == want
    # hot-trigram pruning: intersecting only the rarest trigrams must
    # stay exact (the confirm join guarantees it) — here for needle
    # "the table" the hot 'the' posting is skipped at k=2
    got3 = {(r["doc_id"], r["n_occurrences"]) for r in
            substring_search(df, "text", "doc_id", "the table",
                             postings=idx, tri_df=tri_df,
                             max_probe_trigrams=2).collect()}
    assert got3 == {(1, 1)}
    # a needle trigram absent from the index ⇒ provably no match;
    # pruning keeps the df=0 trigram and the probe is empty
    got4 = substring_search(df, "text", "doc_id", "zzzq table",
                            postings=idx, tri_df=tri_df,
                            max_probe_trigrams=2).collect()
    assert got4 == []
    # short-needle fallback (no trigrams): direct scan
    short = {r["doc_id"] for r in
             substring_search(df, "text", "doc_id", "on").collect()}
    assert short == {2}


def test_fuzzy_join_duplicate_ids_keep_distinct_value_pairs(spark):
    """ADVICE r8: when id columns are not unique keys, distinct
    (l_val, r_val) pairs sharing an (l_id, r_id) must ALL survive —
    dedup runs on ids AND values."""
    left = spark.createDataFrame(
        [(7, "cat"), (7, "car")], "gid long, name string")
    right = spark.createDataFrame(
        [(9, "cat"), (9, "cab")], "gid long, name string")
    out = fuzzy_join(left, right, "name", "name", max_distance=1,
                     left_id="gid", right_id="gid")
    got = {(r["l_val"], r["r_val"], r["dist"]) for r in out.collect()}
    # every (l_id, r_id) is (7, 9); four value pairs are all <= 1 edit
    assert got == {("cat", "cat", 0), ("cat", "cab", 1),
                   ("car", "cat", 1), ("car", "cab", 1)}
    assert {(r["l_id"], r["r_id"]) for r in out.collect()} == {(7, 9)}
