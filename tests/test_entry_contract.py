"""Driver-contract smoke: every registered query runs at sf0.001 and
returns a well-formed DataFrame; oracle coverage is complete for
SQL-expressible queries."""

import pytest

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"user_id", "pct_change"} <= set(df.columns)


def test_registry_shape():
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert len(qs) >= 45
    assert set(oracles) <= set(qs)
    # rows-only queries are the documented non-SQL-expressible ones
    # (lsh_ann_top3 left this set in r4 via the plane-literal oracle;
    # ml_next_day_prediction in r5 via the Cramer normal-equations
    # oracle — only the sketch-valued profile remains by design)
    assert set(qs) - set(oracles) == {"corpus_sketch_profile"}


@pytest.mark.parametrize("name", sorted(contract.queries()))
def test_each_query_runs_smoke(spark, sf_dir, name):
    df = contract.queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_fn_segments_granularity():
    """Function-granular staleness: segments isolate each decorated
    function (decorator included, so oracle-SQL edits count), and the
    module-level remainder ignores blank-line churn."""
    from trading_dashboard_spark.queries import _fn_segments

    src_a = (
        "X = 1\n\n"
        "@register('q1', 'SELECT 1')\n"
        "def q1(spark, sf):\n"
        "    return 1\n\n\n"
        "def q2(spark, sf):\n"
        "    return 2\n"
    )
    fns_a, rest_a = _fn_segments(src_a)
    assert set(fns_a) == {"q1", "q2"}
    assert "@register('q1', 'SELECT 1')" in fns_a["q1"]

    # appending a new function leaves q1/q2 segments and remainder alone
    src_b = src_a + "\n\ndef q3(spark, sf):\n    return 3\n"
    fns_b, rest_b = _fn_segments(src_b)
    assert fns_b["q1"] == fns_a["q1"] and fns_b["q2"] == fns_a["q2"]
    assert rest_b == rest_a

    # editing only the oracle SQL in the decorator changes q1's segment
    src_c = src_a.replace("'SELECT 1'", "'SELECT 2'")
    fns_c, rest_c = _fn_segments(src_c)
    assert fns_c["q1"] != fns_a["q1"]
    assert fns_c["q2"] == fns_a["q2"] and rest_c == rest_a

    # editing module-level code changes only the remainder
    src_d = src_a.replace("X = 1", "X = 2")
    fns_d, rest_d = _fn_segments(src_d)
    assert fns_d == fns_a and rest_d != rest_a


def test_rotation_covers_fresh_within_window():
    """Every never-verified query lands inside the driver's window
    (fresh fits this round — the round-5 drain directive), preceded
    only by pins and head-stale entries."""
    from trading_dashboard_spark.queries import (
        _DRIVER_WINDOW, _PIN_REVERIFY, QUERY_REGISTRY, _verified_rounds,
    )

    names = list(QUERY_REGISTRY)
    verified = set(_verified_rounds())
    fresh = [n for n in names if n not in verified]
    if len(fresh) + len(_PIN_REVERIFY) <= _DRIVER_WINDOW:
        window = names[:_DRIVER_WINDOW]
        assert all(n in window for n in fresh)
        assert all(p in window for p in _PIN_REVERIFY if p in verified)
    # pins lead unconditionally
    live_pins = [p for p in _PIN_REVERIFY if p in verified]
    assert names[: len(live_pins)] == live_pins


def test_rotation_reserve_is_floor_under_pressure():
    """Round-4 verdict #6: with a synthetic 60-new/20-stale registry the
    reserve must guarantee >=12 stale slots inside the 50-slot window —
    a floor, not a residual (round 4 starved it to zero)."""
    from trading_dashboard_spark.queries import _window_order

    fresh = [f"new_{i}" for i in range(60)]
    stale = [f"stale_{i}" for i in range(20)]
    rest = [f"proven_{i}" for i in range(30)]
    order = _window_order([], fresh, stale, rest, window=50, reserve=12)
    window = order[:50]
    assert sum(1 for n in window if n in stale) >= 12
    # the floor takes the HIGHEST-priority stale entries, in order
    assert window[:12] == stale[:12]
    # no query is dropped or duplicated by the re-keying
    assert sorted(order) == sorted(fresh + stale + rest)

    # when fresh fits the window, fresh is never evicted by stale
    order2 = _window_order([], fresh[:43], stale, rest, window=50, reserve=12)
    window2 = order2[:50]
    assert all(n in window2 for n in fresh[:43])
    assert sum(1 for n in window2 if n in stale) == 7  # leftover slots

    # pins always lead and are deduplicated out of the stale block
    order3 = _window_order(
        ["stale_3", "proven_1"], fresh[:10], stale, rest,
        window=50, reserve=12,
    )
    assert order3[:2] == ["stale_3", "proven_1"]
    assert order3.count("stale_3") == 1 and order3.count("proven_1") == 1


def test_module_level_pure_additions_do_not_stale_siblings(tmp_path, monkeypatch):
    """r6 rotation fix: appending NEW module-level constants/helpers
    (shipped alongside new queries) must not mark every pre-existing
    query in the module stale — code that existed before cannot depend
    on lines that didn't exist. Removals/modifications still flood
    conservatively."""
    import subprocess

    from trading_dashboard_spark import queries as q

    repo = tmp_path / "repo"
    pkg = repo / "pkg"
    pkg.mkdir(parents=True)
    f = pkg / "mod.py"
    base = "X = 1\n\ndef q1():\n    return X\n"
    f.write_text(base)
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "base"],
        cwd=repo, check=True,
    )
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True,
        text=True, check=True,
    ).stdout.strip()
    monkeypatch.setattr(q, "_REPO_ROOT", str(repo))

    # pure addition: new constant + new function -> no module-level flag
    f.write_text(base + "\nY = 2\n\ndef q2():\n    return Y\n")
    changed, module_level = q._fn_changes("pkg/mod.py", head)
    assert changed == {"q2"} and module_level is False

    # modifying an existing module-level line still floods
    f.write_text(base.replace("X = 1", "X = 3"))
    changed, module_level = q._fn_changes("pkg/mod.py", head)
    assert module_level is True

    # removing one still floods
    f.write_text(base.replace("X = 1\n", ""))
    _, module_level = q._fn_changes("pkg/mod.py", head)
    assert module_level is True


def test_verified_rounds_cover_every_driver_row():
    """Every green name recorded in a CORRECTNESS_r*.json artifact must
    appear in _verified_rounds() — forgetting a round would silently
    re-burn window slots on already-green queries.  Since r9 the ledger
    is DERIVED from the artifacts (r8 verdict #1), so this holds even
    when the current round's artifact lands untracked after the final
    commit — the exact condition that made the tuple-only design red at
    every judge review."""
    import json
    import os

    from trading_dashboard_spark.queries import _verified_rounds

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recorded = set(_verified_rounds())
    for fname in sorted(os.listdir(repo)):
        if fname.startswith("CORRECTNESS_r") and fname.endswith(".json"):
            with open(os.path.join(repo, fname)) as fh:
                rows = json.load(fh)
            green = {
                n for n, row in rows.items()
                if (row.get("err") in (None, "no_oracle")
                    and row.get("hash_match") is not False)
            }
            missing = green - recorded
            assert not missing, f"{fname} rows unrecorded: {sorted(missing)}"


def test_verified_rounds_derive_from_artifacts(tmp_path, monkeypatch):
    """The ledger reads CORRECTNESS_r*.json itself: a fresh artifact is
    picked up with no code change; real failures and hash mismatches are
    NOT remembered as green (they must re-run); the by-design
    ``no_oracle`` rows-only check counts; later rounds win."""
    import json

    from trading_dashboard_spark import queries as q

    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps({
        "green_q": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        "rows_only_q": {"rows_match": None, "schema_match": None,
                        "hash_match": None, "err": "no_oracle"},
        "failed_q": {"rows_match": None, "schema_match": None,
                     "hash_match": None, "err": "boom"},
        "mismatch_q": {"rows_match": True, "schema_match": True,
                       "hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps({
        "green_q": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
    }))
    monkeypatch.setattr(q, "_REPO_ROOT", str(tmp_path))

    rounds = q._artifact_rounds()
    assert rounds["green_q"] == 99  # latest round wins
    assert rounds["rows_only_q"] == 98
    assert "failed_q" not in rounds
    assert "mismatch_q" not in rounds

    # the union ledger surfaces them too (tuples still contribute)
    merged = q._verified_rounds()
    assert merged["green_q"] == 99
    assert "failed_q" not in merged

    # a corrupt artifact degrades gracefully instead of crashing import
    (tmp_path / "CORRECTNESS_r97.json").write_text("{not json")
    rounds2 = q._artifact_rounds()
    assert rounds2["green_q"] == 99
