"""Re-export shim: the round-7 gate queries moved into suite_llm in
round 10 (single implementation home; suite.py still merges them into
the registry at the same position, so rotation order is unchanged).
Kept so existing imports — tests/test_suite_staging.py, suite_crawl's
fixture chrome helpers — stay valid."""

from __future__ import annotations

from spdb_spark.suite_llm import (  # noqa: F401
    _CHROME_POST,
    _CHROME_PRE,
    _sql_quote,
    STAGED_R7 as STAGED,
    q_audio_afp_pairs,
    q_c4_rules,
    q_cap_per_host,
    q_ccnet_buckets,
    q_dsir_weights,
    q_gopher_quality,
    q_html_main_text,
    q_image_phash_pairs,
    q_registered_domain,
    q_shard_assignment,
    q_url_normalize,
    q_video_phash_pairs,
)
