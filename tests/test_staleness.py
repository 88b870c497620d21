"""Git-derived driver-check staleness (VERDICT r7 "What's wrong" #2).

These tests run against the real repo history — they pin that the
derivation (a) covers every registered query, (b) reaches through the
layers that r7's hand-maintained list missed, and (c) degrades safely.
"""

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from smalltsdb_spark import staleness  # noqa: E402
from smalltsdb_spark.queries import ORACLE, QUERIES  # noqa: E402
import smalltsdb_spark.queries_ext  # noqa: E402,F401
import smalltsdb_spark.queries_rel  # noqa: E402,F401


@pytest.fixture(scope="module")
def rounds():
    tr = staleness.touch_rounds(QUERIES, ORACLE)
    assert tr, "derivation must work inside the repo's own git checkout"
    return tr


def test_every_query_gets_a_round(rounds):
    missing = set(QUERIES) - set(rounds)
    assert not missing, missing
    assert all(isinstance(r, int) and r >= 1 for r in rounds.values())


def test_storage_rewrite_reaches_sync_queries(rounds):
    """r7 rewrote storage/tsdb under these; the hand list missed them —
    the derivation must not (VERDICT r7 item 2's named failure)."""
    for q in ["tsdb_sync_idempotent", "tsdb_two_databases",
              "stream_rollup_finality", "stream_ingest_e2e"]:
        assert rounds[q] >= 7, (q, rounds[q])


def test_pure_relation_queries_are_not_dragged_by_registry_noise(rounds):
    """rel_pricing_summary reads lineitem and aggregates — it depends on
    nothing that changed after its registration round, so registry-file
    churn (new queries appended every round) must not mark it touched."""
    assert rounds["rel_pricing_summary"] <= 2, rounds["rel_pricing_summary"]


def test_dependency_closure_reaches_operator_modules():
    repo = staleness._Repo()
    fn = QUERIES["ext_export_shards"]
    segs, whole = staleness._query_dependencies(
        repo, staleness._module_relpath(fn.__module__),
        {staleness._qualname_root(fn)},
    )
    deps = {p for p, _ in segs} | whole
    assert "smalltsdb_spark/operators/export.py" in deps


def test_oracle_functions_are_part_of_the_closure():
    """An oracle embeds semantics; editing it changes what green means,
    so it must contribute to the touch round — both as a lazy callable
    registered directly (sim_kmeans) and as an eager helper call inside
    the decorator (tsdb_daemon_ingest's @query(..., _daemon_oracle()))."""
    repo = staleness._Repo()
    fn, oracle = QUERIES["sim_kmeans"], ORACLE["sim_kmeans"]
    assert callable(oracle)
    segs, _ = staleness._query_dependencies(
        repo, staleness._module_relpath(fn.__module__),
        {staleness._qualname_root(fn), staleness._qualname_root(oracle)},
    )
    assert ("smalltsdb_spark/queries_ext.py", "_kmeans_fit_oracle") in segs

    fn = QUERIES["tsdb_daemon_ingest"]
    segs, _ = staleness._query_dependencies(
        repo, staleness._module_relpath(fn.__module__),
        {staleness._qualname_root(fn)},
    )
    # reached through the decorator's Name reference, no qualname needed
    assert ("smalltsdb_spark/queries.py", "_daemon_oracle") in segs


def test_decorator_and_oracle_sql_are_inside_the_hashed_segment():
    """The @query(...) decorator (inline oracle SQL included) must be part
    of the hashed source span — an oracle edit is a semantic touch."""
    repo = staleness._Repo()
    info = repo.current("smalltsdb_spark/queries.py")
    src = staleness._segment_source(info, "tsdb_retention")
    assert src.lstrip().startswith("@query(")
    assert "SELECT count(*) AS kept" in src


def test_fails_closed_outside_a_git_repo(monkeypatch, tmp_path, capsys):
    """A broken derivation must not masquerade as 'nothing stale'
    (ADVICE r8): outside git, EVERY query is reported touched at
    STALE_ROUND (sorts stale) and a visible warning is printed."""
    monkeypatch.setattr(staleness, "REPO", str(tmp_path))
    tr = staleness.touch_rounds(QUERIES, ORACLE)
    assert set(tr) == set(QUERIES)
    assert all(r == staleness.STALE_ROUND for r in tr.values())
    assert "failing closed" in capsys.readouterr().err


def test_current_round_touches_sort_into_driver_prefix():
    """The property the whole staleness machinery exists to guarantee
    (VERDICT r8 item 5): every query whose derived touch round is the
    CURRENT round — i.e. whose implementation changed since the last
    driver certification — must sort into the first 50 of
    ``_driver_order`` (the driver's per-round check budget)."""
    import __spark_entry__ as e

    BUDGET = 50
    order = e._driver_order(list(e.QUERIES))
    cur = staleness._Repo().current_round
    touched = e._touched_rounds()
    hot = {n for n in e.QUERIES if touched.get(n, 0) >= cur}
    assert hot, "a build round always touches at least one query"
    prefix = set(order[:BUDGET])
    if len(hot) <= BUDGET:
        assert hot <= prefix, sorted(hot - prefix)
    else:
        # budget overflow: the prefix must consist solely of hot queries
        assert prefix <= hot, sorted(prefix - hot)


def test_uncommitted_edits_count_as_current_round(tmp_path):
    """file_rounds must see dirty working-tree files as the current round
    (the driver checks a tree the builder may not have committed yet)."""
    repo = staleness._Repo()
    probe = os.path.join(ROOT, "smalltsdb_spark", "_staleness_probe.py")
    try:
        with open(probe, "w") as f:
            f.write("PROBE = 1\n")
        fresh = staleness._Repo()
        assert (
            fresh.file_rounds.get("smalltsdb_spark/_staleness_probe.py")
            == fresh.current_round
        )
    finally:
        os.remove(probe)
    assert repo.current_round == max(repo.boundaries) + 1
