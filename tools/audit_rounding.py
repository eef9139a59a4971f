"""Audit oracle outputs for rounding-boundary flake risk.

The r6 driver red (`q_agg_stats`) was a VALUE problem, not a logic
problem: `covar_samp` of two independent uniforms is ~1e-6, the same
order as its 6-decimal rounding ULP, so cross-engine float-accumulation
noise (partial-agg merge order) can flip the rounded digit between
Spark and DuckDB. This script sweeps EVERY oracle's DuckDB output at
sf0.01 and flags any float value that sits within ``EPS`` of a
half-step rounding boundary at any plausible rounding scale — i.e.
values where an engine disagreement of ~1e-9 relative could change
the rounded output and hash-mismatch a cert.

Usage: python tools/audit_rounding.py [sf_dir]
Exit 0 = no risk found; prints one line per risky (query, column).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from twitter_etl_spark.harness import duckdb_connect  # noqa: E402
from twitter_etl_spark.queries import ALL_ORACLES  # noqa: E402

# noise an engine pair can realistically disagree by, relative to the
# accumulation magnitude; 1e-9 is generous (measured disagreements are
# <=1e-11 on 60k-row sums)
REL_NOISE = 1e-9
# values whose magnitude is below ABS_FLOOR are checked against the
# absolute noise floor instead (sums of near-cancelling terms)
ABS_FLOOR = 1e-4


def boundary_risk(x: float) -> str | None:
    """Return a reason string if ``x`` looks like a rounded float
    whose unrounded source could straddle the rounding boundary."""
    if x is None or not isinstance(x, float) or not math.isfinite(x) or x == 0.0:
        return None
    # infer the rounding scale: smallest d in 0..8 with round(x, d) == x
    for d in range(0, 9):
        if round(x, d) == x:
            break
    else:
        return None  # not visibly rounded; full-precision compares are
        # already forbidden by SURVEY §5.3 and caught by the hash gate
    ulp = 10.0 ** (-d)
    # a value within ~noise of half-ULP off a boundary only exists when
    # |x| is itself near the ULP: then the pre-rounding true value can
    # sit anywhere in [x - ulp/2, x + ulp/2] and noise flips the digit
    if abs(x) <= 2 * ulp and d >= 4:
        return f"magnitude {x:g} ~ rounding ULP 1e-{d}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb_connect(sf_dir)
    risky = 0
    for name, sql in sorted(ALL_ORACLES.items()):
        try:
            rel = con.execute(sql)
            cols = [c[0] for c in rel.description]
            rows = rel.fetchall()
        except duckdb.Error as exc:  # pragma: no cover
            print(f"{name}: oracle failed: {exc}")
            risky += 1
            continue
        flagged: dict[str, str] = {}
        for row in rows:
            for c, v in zip(cols, row):
                if c in flagged:
                    continue
                reason = boundary_risk(v) if isinstance(v, float) else None
                if reason:
                    flagged[c] = reason
        for c, reason in flagged.items():
            print(f"{name}.{c}: {reason}")
            risky += 1
    print(f"audited {len(ALL_ORACLES)} oracles: {risky} risky values")
    return 1 if risky else 0


if __name__ == "__main__":
    sys.exit(main())
