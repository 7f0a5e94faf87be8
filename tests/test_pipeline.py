"""Quality-filter pipeline: verdicts partition the corpus, first-fail
ordering holds, and the rules-only path stays shuffle-free."""

from pyspark.sql import functions as F

from spdb_spark.functions.pipeline import RULE_ORDER, quality_filter, quality_report
from spdb_spark.session import load_tables


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]


def test_report_partitions_corpus(spark):
    docs = _docs(spark)
    v = quality_filter(docs, min_tokens=12, max_tokens=90)
    rep = {r.reject_reason: r.n_docs for r in quality_report(v).collect()}
    assert sum(rep.values()) == docs.count()
    assert rep.get("kept", 0) > 0 and len(rep) > 2  # rules actually fire
    assert set(rep) <= set(RULE_ORDER) | {"kept"}


def test_keep_iff_kept(spark):
    v = quality_filter(_docs(spark), min_tokens=12, max_tokens=90).collect()
    for r in v:
        assert r.keep == (1 if r.reject_reason == "kept" else 0)


def test_first_fail_ordering_and_drop_ids(spark):
    # doc 1: near-dup AND too short -> near_dup wins (first in RULE_ORDER);
    # doc 2: too short AND wrong lang -> too_short wins; doc 3 passes all.
    docs = spark.createDataFrame(
        [
            (1, "der und"),
            (2, "el la y"),
            (3, "the cat and the dog sat on a mat of straw in the sun "
                "to rest for a while and the day was warm"),
        ],
        "doc_id long, text string",
    )
    drops = spark.createDataFrame([(1,)], "doc_id long")
    v = {
        r.doc_id: r.reject_reason
        for r in quality_filter(
            docs,
            drop_ids=drops,
            min_tokens=5,
            min_stop_ratio=0.0,
            min_quality=0.0,
            mean_tok_len_bounds=(1.0, 10.0),
        ).collect()
    }
    assert v == {1: "near_dup", 2: "too_short", 3: "kept"}


def test_rules_only_plan_is_shuffle_free(spark):
    v = quality_filter(_docs(spark))
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_drop_ids_join_is_broadcast(spark):
    docs = _docs(spark)
    drops = docs.select("doc_id").where(F.col("doc_id") < 5)
    plan = (
        quality_filter(docs, drop_ids=drops)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
