"""The driver-compatibility contract for DuckDB oracle results.

One definition of "driver-hostile" result types, shared by the gate
mirror (tools/run_gate.py) and the oracle auditor
(tools/scan_oracle_types.py) — the r4 lesson was that DuckDB widens
integer SUM to HUGEINT (int128), which the correctness driver's pandas
canonicalizer hashes differently than Spark's int64 while rows_match
stays green. Keeping the predicate in one place means the next hostile
type class is added once and both tools agree.
"""

from __future__ import annotations

# DuckDB types pandas cannot hold losslessly in an int64/float64 lane.
_BAD_EXACT = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def hostile_oracle_cols(columns, types) -> list[tuple[str, str]]:
    """(column, type) pairs of a DuckDB relation whose values would hash
    differently under the driver's pandas canonicalizer than Spark's
    BIGINT/DOUBLE output. DECIMAL is rejected wholesale: p > 18 exceeds
    int64 and ANY decimal lands as Python Decimal objects in pandas."""
    out = []
    for name, dtype in zip(columns, types):
        s = str(dtype)
        if s in _BAD_EXACT or s.startswith("DECIMAL"):
            out.append((name, s))
    return out
