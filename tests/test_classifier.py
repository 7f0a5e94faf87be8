"""Hashed n-gram linear classifier (functions/classifier.py): one-pass
NB training separates distinctive vocabularies, inference is mean-pooled
and shuffle-disciplined, unseen-bucket grams contribute zero."""

from pyspark.sql import functions as F

FIN = ("the market closed higher today with bank shares leading gains "
       "while analysts said rates and earnings will drive the quarter")
COOK = ("simmer the onions in butter until golden then fold in the rice "
        "and stock a ladle at a time stirring gently until soft")


def _corpus(spark, n=40):
    rows = []
    for i in range(n):
        text = (FIN if i % 2 == 0 else COOK) + f" item {i}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_nb_training_separates_classes(spark):
    from spdb_spark.functions.classifier import (
        linear_text_classifier,
        nb_classifier_weights,
    )

    docs = _corpus(spark)
    pos = docs.where(F.col("doc_id") % 2 == 0)  # finance
    neg = docs.where(F.col("doc_id") % 2 == 1)  # cooking
    w = nb_classifier_weights(pos, neg)
    assert w.count() <= 1024
    out = {r["doc_id"]: (r["score"], r["prob"])
           for r in linear_text_classifier(docs, w).collect()}
    fin_scores = [out[i][0] for i in range(0, 40, 2)]
    cook_scores = [out[i][0] for i in range(1, 40, 2)]
    assert min(fin_scores) > max(cook_scores)  # clean separation
    assert all(out[i][1] > 0.5 for i in range(0, 40, 2))
    assert all(out[i][1] < 0.5 for i in range(1, 40, 2))


def test_unseen_grams_contribute_zero(spark):
    from spdb_spark.functions.classifier import linear_text_classifier

    docs = spark.createDataFrame(
        [(1, "zzqx wvut entirely novel grams")], "doc_id long, text string"
    )
    empty_w = spark.createDataFrame([], "bucket long, weight double")
    r = linear_text_classifier(docs, empty_w).collect()[0]
    assert r["score"] == 0.0 and r["prob"] == 0.5


def test_inference_plan_shape(spark):
    from spdb_spark.functions.classifier import (
        linear_text_classifier,
        nb_classifier_weights,
    )

    docs = _corpus(spark)
    w = nb_classifier_weights(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )
    plan = (
        linear_text_classifier(docs, w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # weights broadcast onto the exploded grams; the only corpus-keyed
    # exchange is the per-doc aggregate; no row-at-a-time Python. The
    # training side's full-outer bucket join may sort-merge — both of
    # its inputs are bounded at n_buckets rows — but no join anywhere
    # may key on the corpus ids.
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    import re

    for m in re.finditer(r"SortMergeJoin \[([^\]]*)\]", plan):
        assert "doc_id" not in m.group(1), plan


def test_stream_scoring_matches_batch(spark, tmp_path):
    """Frozen-LUT streaming scorer == batch scorer, exactly, on a real
    file-source stream (the streaming/dsir.py protocol applied to the
    classifier's left-join/mean semantics)."""
    from spdb_spark.functions.classifier import (
        linear_text_classifier,
        nb_classifier_weights,
    )
    from spdb_spark.streaming.classifier import (
        classifier_lut,
        classifier_score_stream,
    )

    docs = _corpus(spark)
    w = nb_classifier_weights(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        n_buckets=512,
    )
    batch = {
        r["doc_id"]: (r["n_grams"], r["score"], r["prob"])
        for r in linear_text_classifier(docs, w, n_buckets=512).collect()
    }

    src = tmp_path / "docs_clf"
    src.mkdir()
    docs.coalesce(1).write.parquet(str(src / "p1"))
    lut = classifier_lut(w, 512)
    stream = spark.readStream.schema(docs.schema).parquet(str(src / "*"))
    q = (
        classifier_score_stream(stream, lut, 512)
        .writeStream.format("memory")
        .queryName("clf_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["n_grams"], r["score"], r["prob"])
        for r in spark.sql(
            "SELECT * FROM clf_out WHERE n_grams > 0"
        ).collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        # n_grams and score are EXACT; prob goes through exp(), where
        # Python libm and the JVM differ in the last ulp
        assert streamed[k][0] == batch[k][0]
        assert streamed[k][1] == batch[k][1]
        assert abs(streamed[k][2] - batch[k][2]) <= 1e-12
