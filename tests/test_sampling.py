"""Deterministic curation ops: split assignment is a pure function of the
row key — stable under corpus growth, re-partitioning, and re-runs."""

from pyspark.sql import functions as F

from spdb_spark.functions.sampling import hash_split, stratified_sample


def test_split_stable_under_growth(spark):
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in hash_split(small, "doc_id").collect()}
    s_big = {r.doc_id: r.split for r in hash_split(big, "doc_id").collect()}
    # every original row keeps its split when the corpus doubles
    assert all(s_big[k] == v for k, v in s_small.items())
    # realized fractions near the request (80/10/10 +- granularity noise)
    n = len(s_big)
    frac_train = sum(v == "train" for v in s_big.values()) / n
    assert 0.74 <= frac_train <= 0.86


def test_split_partition_invariant(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b


def test_stratified_sample_respects_fractions(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, "lang", {"en": 0.5}, "doc_id", default_fraction=0.1)
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 400 <= counts.get("en", 0) <= 600   # ~50% of 1000
    assert 50 <= counts.get("de", 0) <= 150    # ~10% of 1000
    # sample of a superset contains the sample of the subset
    sub = stratified_sample(
        df.where(F.col("doc_id") < 500), "lang", {"en": 0.5}, "doc_id", default_fraction=0.1
    )
    sub_ids = {r.doc_id for r in sub.collect()}
    out_ids = {r.doc_id for r in out.collect()}
    assert sub_ids <= out_ids


class TestReservoirPerGroup:
    def test_exact_k_smallest_hashes_and_partition_invariance(self, spark):
        import hashlib

        from spdb_spark.functions.sampling import reservoir_per_group

        rows = [(f"g{i % 3}", i) for i in range(200)]
        df = spark.createDataFrame(rows, "grp string, doc_id long")
        got = {
            (r.grp, r.doc_id)
            for r in reservoir_per_group(df, "grp", "doc_id", 4, salt="s").collect()
        }
        expected = set()
        for g in ("g0", "g1", "g2"):
            members = sorted(
                (i for grp, i in rows if grp == g),
                key=lambda i: (hashlib.md5(f"s:{i}".encode()).hexdigest(), i),
            )
            expected |= {(g, i) for i in members[:4]}
        assert got == expected

        got2 = {
            (r.grp, r.doc_id)
            for r in reservoir_per_group(
                df.repartition(17), "grp", "doc_id", 4, salt="s"
            ).collect()
        }
        assert got2 == got

    def test_growth_only_displaces(self, spark):
        from spdb_spark.functions.sampling import reservoir_per_group

        small = spark.createDataFrame(
            [("g", i) for i in range(50)], "grp string, doc_id long"
        )
        grown = spark.createDataFrame(
            [("g", i) for i in range(100)], "grp string, doc_id long"
        )
        a = {r.doc_id for r in reservoir_per_group(small, "grp", "doc_id", 10).collect()}
        b = {r.doc_id for r in reservoir_per_group(grown, "grp", "doc_id", 10).collect()}
        # every sampled row of the grown corpus that existed before was
        # already sampled before (new rows can displace, never promote)
        assert (b & set(range(50))) <= a


def test_apply_mixture_preserves_corpus_column_named_domain(spark):
    """ADVICE r4: a corpus whose domain column is literally named "domain"
    (or that carries its own "rate_ppm") must keep its columns — the
    plan's join columns are aliased, never dropped by shared name."""
    from spdb_spark.functions.sampling import apply_mixture

    corpus = spark.createDataFrame(
        [(i, "web" if i % 2 else "code", 7) for i in range(100)],
        "id long, domain string, rate_ppm int",
    )
    plan = spark.createDataFrame(
        [("web", 1_000_000), ("code", 1_000_000)], "domain string, rate_ppm long"
    )
    out = apply_mixture(corpus, "domain", "id", plan)
    assert set(out.columns) == {"id", "domain", "rate_ppm"}
    rows = out.collect()
    assert len(rows) == 100  # rate 1e6 keeps everything
    assert all(r.domain in ("web", "code") and r.rate_ppm == 7 for r in rows)


def test_reservoir_invariant_to_subgroup_width(spark):
    """VERDICT r4 'What's wrong' #2: the two-stage reservoir's subgroup
    width is a performance knob — the SAMPLE must not depend on it."""
    from spdb_spark.functions.sampling import reservoir_per_group

    df = spark.createDataFrame(
        [(f"d{i:04d}", "en" if i % 3 else "fr") for i in range(300)],
        "doc_id string, lang string",
    )
    base = {
        (r.lang, r.doc_id)
        for r in reservoir_per_group(
            df, "lang", "doc_id", 7, subgroup_chars=2
        ).collect()
    }
    for sc in (1, 3):
        got = {
            (r.lang, r.doc_id)
            for r in reservoir_per_group(
                df, "lang", "doc_id", 7, subgroup_chars=sc
            ).collect()
        }
        assert got == base, sc
    # and equal to the single-window definition
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key = F.md5(F.concat(F.lit("reservoir:"), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    want = {
        (r.lang, r.doc_id)
        for r in df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 7)
        .collect()
    }
    assert base == want


def test_enumeration_width_policy():
    """Width grows with the corpus so the expected bucket stays bounded:
    1 hex char up to 64M rows, 4-5 at 100 TB scales."""
    from spdb_spark.functions.sampling import TARGET_BUCKET_ROWS, enumeration_width

    assert enumeration_width(5_000) == 1
    assert enumeration_width(TARGET_BUCKET_ROWS * 16) == 1
    assert enumeration_width(TARGET_BUCKET_ROWS * 16 + 1) == 2
    assert enumeration_width(10**11) == 4  # ~100 TB of 1 KB docs
    assert enumeration_width(10**18) == 8  # capped
    # derived widths keep the expected bucket under target
    for n in (10**6, 10**9, 10**12):
        w = enumeration_width(n)
        assert n / (16 ** w) <= TARGET_BUCKET_ROWS or w == 8


def test_quantile_buckets_exact_and_approx(spark):
    from spdb_spark.functions.sampling import quantile_buckets

    rows = [(i, float(i)) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, score double")
    out = {r["id"]: r["bucket"] for r in
           quantile_buckets(df, "score").collect()}
    assert len(out) == 90
    # ascending labels: first third tail, last third head
    assert out[0] == "tail" and out[45] == "middle" and out[89] == "head"
    n = {}
    for b in out.values():
        n[b] = n.get(b, 0) + 1
    assert abs(n["tail"] - 30) <= 1 and abs(n["head"] - 30) <= 1
    # approx path: same labels away from the boundaries
    ap = {r["id"]: r["bucket"] for r in
          quantile_buckets(df, "score", approx=True).collect()}
    assert ap[0] == "tail" and ap[45] == "middle" and ap[89] == "head"
    # label/prob arity is validated
    import pytest as _pt
    with _pt.raises(ValueError):
        quantile_buckets(df, "score", probs=(0.5,), labels=("a", "b", "c"))
