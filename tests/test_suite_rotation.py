"""Registry self-rotation: the driver's correctness gate samples the first
50 queries() entries, so the registry orders never-driver-checked queries
first by reading the repo's recorded CORRECTNESS_r*.json files."""

import json


def test_never_checked_queries_come_first():
    import glob
    import os

    from spdb_spark.suite import _PRIORITY_RECHECK, REGISTRY, _BASE, _last_checked_round

    last = _last_checked_round()
    names = list(REGISTRY)
    # same contents as the static union, just reordered
    assert set(names) == set(_BASE)
    # priority-recheck queries (fixed-but-never-driver-reverified) jump the
    # LRU rotation and lead the registry outright
    n_prio = len([n for n in names if n in _PRIORITY_RECHECK])
    assert set(names[:n_prio]) == set(_PRIORITY_RECHECK) & set(_BASE)
    # below the priority pins, the ordering key (last-checked round) must
    # be non-decreasing
    rest = names[n_prio:]
    rounds = [last.get(n, 0) for n in rest]
    assert rounds == sorted(rounds)
    # with the repo's recorded results present, anything never checked
    # must appear before anything ever checked (priority pins aside)
    if glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "CORRECTNESS_r*.json")
    ):
        checked_positions = [i for i, n in enumerate(rest) if last.get(n, 0) > 0]
        unchecked_positions = [i for i, n in enumerate(rest) if last.get(n, 0) == 0]
        if checked_positions and unchecked_positions:
            assert max(unchecked_positions) < min(checked_positions)


def test_rotation_tolerates_malformed_records(tmp_path, monkeypatch):
    """A junk CORRECTNESS file must not break registry import logic."""
    from spdb_spark import suite

    bad = tmp_path / "CORRECTNESS_r99.json"
    bad.write_text("not json at all {")
    ok = tmp_path / "CORRECTNESS_r98.json"
    ok.write_text(json.dumps({"llm_repetition": {"rows_match": True}}))
    pkg = tmp_path / "pkg"
    pkg.mkdir()

    real_dirname = suite.os.path.dirname

    def fake_dirname(p):
        # redirect the repo-root derivation to tmp_path
        if p == suite.os.path.abspath(suite.__file__):
            return str(pkg)
        return real_dirname(p)

    monkeypatch.setattr(suite.os.path, "dirname", fake_dirname)
    last = suite._last_checked_round()
    assert last == {"llm_repetition": 98}
