"""Corpus ingest: raw text/jsonl files -> documents schema with
deterministic content-addressed ids."""

import json

from spdb_spark.sources.corpus import ingest_jsonl_files, ingest_text_files

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def test_text_ingest_schema_and_determinism(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "web1.txt").write_text("the cat sat\n\nla maison est grande\nthe cat sat\n")
    (d / "web2.txt").write_text("der hund ist nicht hier\n")

    out = ingest_text_files(spark, str(d / "*.txt"))
    assert [f.name for f in out.schema.fields] == DOC_COLS
    rows = out.collect()
    assert len(rows) == 4  # blank line dropped; duplicate line kept
    assert len({r.doc_id for r in rows}) == 4  # dup text, distinct ids
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, []).append(r)
    assert len(by_text["the cat sat"]) == 2
    assert by_text["la maison est grande"][0].lang == "fr"
    assert by_text["der hund ist nicht hier"][0].source == "web2"
    assert by_text["the cat sat"][0].n_chars == 11

    # re-ingest (different partitioning) -> identical id multiset
    again = {r.doc_id for r in ingest_text_files(spark, str(d / "*.txt")).collect()}
    assert again == {r.doc_id for r in rows}


def test_jsonl_ingest_drops_malformed(spark, tmp_path):
    d = tmp_path / "jl"
    d.mkdir()
    lines = [
        json.dumps({"text": "the quick brown fox", "meta": 1}),
        json.dumps({"nottext": "no payload"}),
        json.dumps({"text": "el perro es grande"}),
    ]
    (d / "dump.jsonl").write_text("\n".join(lines) + "\n")

    out = ingest_jsonl_files(spark, str(d / "*.jsonl")).collect()
    assert {r.text for r in out} == {"the quick brown fox", "el perro es grande"}
    assert all(r.source == "dump" for r in out)


def test_ingested_docs_feed_curation_ops(spark, tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "a.txt").write_text("the cat sat on the mat\nthe cat sat on the mat\n")
    docs = ingest_text_files(spark, str(d / "*.txt"))
    from spdb_spark.functions.dedup import exact_dup_groups

    groups = exact_dup_groups(docs, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].n_docs == 2
