"""Window-rotation invariant (VERDICT r4 item #7).

The driver's correctness gate checks only the FIRST 50 registry entries
each round, so coverage is a rotation discipline: no registry query may
go more than 2 rounds without a fresh driver row. This test parses the
committed CORRECTNESS_r*.json files plus the current ``_WINDOW_FIRST``
and fails if, after the upcoming round runs the current window, any
query's newest driver row would be older than 2 rounds — preventing the
r2/r3 backlog (27 never-checked queries) from ever re-forming as the
registry grows."""

import glob
import json
import re

from bp_datawarehouse_ordersfact_spark import queries as Q

WINDOW_SIZE = 50
MAX_STALENESS = 2  # rounds


def _latest_rows() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    rounds = []
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        r = int(re.search(r"_r(\d+)\.json$", path).group(1))
        rounds.append(r)
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), r)
    return latest, max(rounds)


def test_window_is_exactly_the_first_50_registry_entries():
    first = list(Q.all_queries().keys())[:WINDOW_SIZE]
    assert first == list(Q._WINDOW_FIRST)[:WINDOW_SIZE], (
        "_WINDOW_FIRST does not control the driver's actual window — "
        "registration order diverged"
    )


def test_window_names_are_unique_and_registered():
    w = Q._WINDOW_FIRST
    assert len(w) == len(set(w)) == WINDOW_SIZE
    unknown = [k for k in w if k not in Q.all_queries()]
    assert not unknown, f"window references unregistered queries: {unknown}"


def test_no_query_exceeds_staleness_after_this_window_runs():
    latest, last_round = _latest_rows()
    upcoming = last_round + 1
    window = set(list(Q._WINDOW_FIRST)[:WINDOW_SIZE])

    # Has the CURRENT window already produced the newest CORRECTNESS
    # file? (The driver writes it at round end, BEFORE the next round
    # rotates the tuple — in that in-between state the strict "must be
    # in the current window" form would flag exactly the queries whose
    # rotation is the next round's first action.) Then the enforceable
    # invariant is FEASIBILITY: every query that must be re-checked next
    # round has to fit in one window.
    import json as _json

    newest_path = f"/root/repo/CORRECTNESS_r{last_round:02d}.json"
    checked_last = set(_json.load(open(newest_path)))
    window_has_run = window <= checked_last

    if window_has_run:
        # guard against this branch becoming a permanent bypass: if the
        # PREVIOUS round's checked set was also exactly this window, the
        # rotation was skipped for a full round — fail loudly
        prev_path = f"/root/repo/CORRECTNESS_r{last_round - 1:02d}.json"
        if last_round >= 2:
            prev_checked = set(_json.load(open(prev_path)))
            assert prev_checked != checked_last or window != prev_checked, (
                f"_WINDOW_FIRST unchanged across driver rounds {last_round - 1} "
                f"and {last_round} — the rotation was skipped; rotate now"
            )
        must = [
            name
            for name in Q.all_queries()
            if latest.get(name) is None
            or (upcoming + 1) - latest[name] > MAX_STALENESS
        ]
        assert len(must) <= WINDOW_SIZE, (
            f"rotation infeasible: {len(must)} queries need a round-"
            f"{upcoming} driver row but the window holds {WINDOW_SIZE}: "
            f"{sorted(must)}"
        )
        return

    stale = []
    for name in Q.all_queries():
        if name in window:
            continue  # gets a row in the upcoming round
        newest = latest.get(name)
        if newest is None or upcoming - newest > MAX_STALENESS:
            stale.append((name, newest))
    assert not stale, (
        f"after round {upcoming} runs the current window, these queries' "
        f"newest driver row would exceed {MAX_STALENESS} rounds of "
        f"staleness — rotate them into _WINDOW_FIRST: {stale}"
    )


def test_every_red_or_new_query_is_in_window():
    # a query whose latest committed row is red (or error) must be
    # re-checked next round, not parked outside the window
    latest, last_round = _latest_rows()
    path = f"/root/repo/CORRECTNESS_r{last_round:02d}.json"
    rows = json.load(open(path))
    window = set(list(Q._WINDOW_FIRST)[:WINDOW_SIZE])
    bad = []
    for name, row in rows.items():
        green = row.get("rows_match") and row.get("schema_match") and row.get(
            "hash_match"
        )
        if not green and name in Q.all_queries() and name not in window:
            bad.append(name)
    assert not bad, f"queries red in round {last_round} left out of window: {bad}"
