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


def _assert_stale_prefix_invariant(e, budget=50):
    """The property the staleness machinery exists to guarantee, stated
    over the set the sort key itself defines (VERDICT r9 item 1): a query
    is STALE iff its derived touch round exceeds its most recent
    driver-green round (``touched[n] > last_green[n]``).  Every stale
    query must sort into the driver's check-budget prefix (or, on budget
    overflow, the prefix must consist solely of stale queries), and no
    non-stale query may ever precede a stale one.  Unlike the r8
    formulation (``touched == current_round``), this holds BOTH mid-round
    and in the post-driver-check tree where CORRECTNESS_r{N}.json has
    legitimately rotated freshly-certified rows out of the prefix."""
    names = list(e.QUERIES)
    order = e._driver_order(names)
    touched = e._touched_rounds()
    _, last_green = e._green_history(names)
    stale = {n for n in names if touched.get(n, 0) > last_green[n]}
    prefix = set(order[:budget])
    if len(stale) <= budget:
        assert stale <= prefix, sorted(stale - prefix)
    else:
        assert prefix <= stale, sorted(prefix - stale)
    # total-order half: the stale bucket is a contiguous head of the order
    seen_non_stale = False
    for n in order:
        if n in stale:
            assert not seen_non_stale, f"non-stale query sorted before stale {n}"
        else:
            seen_non_stale = True
    return stale


def test_stale_queries_sort_into_driver_prefix():
    import __spark_entry__ as e

    _assert_stale_prefix_invariant(e)


def test_stale_prefix_invariant_survives_driver_certification():
    """Simulate the post-check tree every next round inherits: drop a
    CORRECTNESS file for the CURRENT round certifying every currently
    stale query green, and re-assert the invariant.  The freshly
    certified rows must leave the stale set (and may leave the prefix —
    that rotation is the mechanism working, not a violation)."""
    import json

    import __spark_entry__ as e

    stale_before = _assert_stale_prefix_invariant(e)
    cur = staleness._Repo().current_round
    path = os.path.join(ROOT, f"CORRECTNESS_r{cur}.json")
    if os.path.exists(path):
        # the live tree already IS post-check for this round; the first
        # assertion above already covered the simulated state
        return
    try:
        with open(path, "w") as f:
            json.dump(
                {n: {"hash_match": True} for n in stale_before}, f
            )
        stale_after = _assert_stale_prefix_invariant(e)
        assert not (stale_after & stale_before), sorted(
            stale_after & stale_before
        )
    finally:
        os.remove(path)


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
