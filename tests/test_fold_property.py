"""Property-based validation of the fold's closed form (SURVEY.md §2.2).

Hypothesis generates arbitrary event sequences (any key mix, any
action mix including invalid/null, any delta sign, shuffled seq order)
and checks the *algebra* — the last-REP + conditional-sum closed form
as SQL — against the independent Python left-fold. Runs on DuckDB only
(no Spark session), so hundreds of examples are cheap; the Spark plan
is the same SQL shape and is covered by the oracle-parity suite.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_aggregate_spark.operators.inventory_fold import python_fold_oracle

CLOSED_FORM_SQL = """
WITH valid AS (
    SELECT * FROM events
    WHERE delta IS NOT NULL AND action IN ('INC', 'DEC', 'REP')
), m AS (
    SELECT *,
           max(CASE WHEN action = 'REP' THEN seq END)
               OVER (PARTITION BY key) AS last_rep_seq
    FROM valid
)
SELECT key,
       CAST(COALESCE(max(CASE WHEN seq = last_rep_seq THEN delta END), 0) AS BIGINT)
       + CAST(COALESCE(sum(CASE WHEN last_rep_seq IS NULL OR seq > last_rep_seq
                                THEN CASE action WHEN 'INC' THEN delta
                                                 WHEN 'DEC' THEN -delta
                                                 ELSE 0 END
                           END), 0) AS BIGINT) AS cnt
FROM m
GROUP BY key
"""

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.sampled_from(["INC", "DEC", "REP", "BOGUS", None]),
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(events_strategy)
def test_closed_form_equals_left_fold(raw_events):
    # Assign unique seq values, then shuffle-resistant: the closed form
    # must not depend on row order, only on seq.
    rows = [
        (key, seq, action, delta)
        for seq, (key, action, delta) in enumerate(raw_events)
    ]
    expected = python_fold_oracle(rows)
    # python_fold_oracle ignores BOGUS rows entirely (continue before
    # seen_valid), matching the SQL's action IN (...) filter.

    con = duckdb.connect()
    con.execute("CREATE TABLE events (key VARCHAR, seq BIGINT, action VARCHAR, delta INTEGER)")
    if rows:
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    got = {k: v for k, v in con.execute(CLOSED_FORM_SQL).fetchall()}
    con.close()
    assert got == expected
