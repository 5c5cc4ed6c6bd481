"""Cross-engine fuzz: the shared expressions the whole oracle chain rests on.

Every driver-oracle comparison assumes the Spark column expression and its
DuckDB SQL rendering stay in lockstep. These tests feed a deterministic
corpus of adversarial strings (titles, suffixes, comma reversals, middle
initials, unicode, degenerate whitespace/punctuation) through BOTH engines
and require byte-identical outputs for:

- ``normalize.norm_key``           vs ``normalize.duckdb_norm_key_sql``
- ``textfns.canonicalize_text``    vs ``textfns.duckdb_canonicalize_text_sql``
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

FRAGMENTS = [
    "Dr.", "Mr", "Mrs.", "Prof", "Alice", "NGUYEN", "van", "der", "O'Brien",
    "Smith-Jones", "Q.", "X", "Jr.", "III", "IV", ",", "  ", "\t", ".",
    "Acme Corp", "prj-42", "émile", "ZOË", "mc donald", "A.", "b",
]


def _corpus(n: int = 400) -> list[str]:
    rng = random.Random(20260817)
    out = []
    for _ in range(n):
        k = rng.randint(1, 6)
        s = " ".join(rng.choice(FRAGMENTS) for _ in range(k))
        if rng.random() < 0.3:
            s = s.replace(" ", ", ", 1)
        if rng.random() < 0.2:
            s = "  " + s + "  "
        out.append(s)
    out += [
        "", " ", "Nguyen, Alice", "Dr. Alice Q. Nguyen Jr.", "SMITH, BOB III",
        "Mr.Smith", "a, b", ",", "Alice  B.  Chen",
        "".join(rng.choice(string.printable[:94]) for _ in range(30)),
    ]
    return out


def _both(spark, spark_expr_fn, duck_sql_fn, values):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, s string")
    got_spark = {
        r["i"]: r["out"]
        for r in df.select("i", spark_expr_fn(F.col("s")).alias("out")).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"i": range(len(values)), "s": values}))
    got_duck = {
        i: v for i, v in con.execute(f"SELECT i, {duck_sql_fn('s')} AS out FROM t").fetchall()
    }
    return got_spark, got_duck


@pytest.mark.parametrize("which", ["norm_key", "canonicalize_text"])
def test_shared_expression_parity(spark, which):
    if which == "norm_key":
        from dice_spark.functions.normalize import duckdb_norm_key_sql, norm_key

        fn, sql = norm_key, duckdb_norm_key_sql
    else:
        from dice_spark.functions.textfns import (
            canonicalize_text,
            duckdb_canonicalize_text_sql,
        )

        fn, sql = canonicalize_text, duckdb_canonicalize_text_sql
    values = _corpus()
    got_spark, got_duck = _both(spark, fn, sql, values)
    diffs = {
        i: (values[i], got_spark[i], got_duck[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
    assert not diffs, f"{len(diffs)} divergent inputs, e.g. {list(diffs.items())[:5]}"


def test_effective_confidence_parity(spark):
    """The bitemporal effectiveConfidence branches (functions/decay.py vs the
    CASE the oracle repeats): currency boundary exactly AT valid_to, closed
    windows never decaying, future anchors clamping to age 0, whole-day
    truncation. 300 fuzzed rows must agree to 6 decimals in both engines."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from dice_spark.functions.decay import effective_confidence

    rng = random.Random(42)
    base = dt.datetime(2024, 6, 1)
    as_of = dt.datetime(2024, 12, 31)

    def maybe_ts(p):
        if rng.random() < p:
            return None
        # offsets chosen to straddle as_of, incl. exact-boundary hits
        return base + dt.timedelta(
            days=rng.randint(-30, 400), seconds=rng.choice([0, 1, 86399])
        )

    rows = []
    for i in range(300):
        vf = maybe_ts(0.4)
        vt = maybe_ts(0.6) if vf is not None else None
        rows.append((
            i,
            round(rng.uniform(0, 1), 4),
            round(rng.uniform(0, 1), 4),
            base + dt.timedelta(days=rng.randint(-10, 200)),
            vf,
            vt,
            maybe_ts(0.85),
        ))
    # exact currency boundary: as_of == valid_to must NOT be current
    rows.append((300, 0.9, 0.1, base, base, as_of, None))

    df = spark.createDataFrame(
        rows,
        "i int, confidence double, decay double, content_revised timestamp,"
        " valid_from timestamp, valid_to timestamp, invalidated_at timestamp",
    )
    got_spark = {
        r["i"]: r["eff"]
        for r in df.select(
            "i",
            F.round(
                effective_confidence(as_of=F.to_timestamp(F.lit("2024-12-31 00:00:00"))),
                6,
            ).alias("eff"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        rows,
        columns=["i", "confidence", "decay", "content_revised", "valid_from",
                 "valid_to", "invalidated_at"],
    ))
    epoch = "floor(epoch(timestamp '2024-12-31 00:00:00'))"

    def decay_from(anchor):
        return (f"round(confidence * exp(-decay * 2.0 * "
                f"greatest(floor(({epoch} - {anchor}) / 86400), 0)), 6)")

    sql = f"""
    SELECT i, round(CASE
      WHEN invalidated_at IS NOT NULL
           AND floor(epoch(invalidated_at)) <= {epoch} THEN 0.0
      WHEN valid_from IS NOT NULL AND NOT (floor(epoch(valid_from)) <= {epoch}
           AND (valid_to IS NULL OR {epoch} < floor(epoch(valid_to)))) THEN 0.0
      WHEN valid_from IS NOT NULL AND valid_to IS NOT NULL THEN confidence
      WHEN valid_from IS NOT NULL THEN {decay_from('floor(epoch(valid_from))')}
      ELSE {decay_from('floor(epoch(content_revised))')}
    END, 6) AS eff FROM t"""
    got_duck = {i: v for i, v in con.execute(sql).fetchall()}
    diffs = {
        i: (got_spark[i], got_duck[i])
        for i in got_spark
        if abs(got_spark[i] - got_duck[i]) > 1e-9
    }
    assert not diffs, f"{len(diffs)} divergent rows, e.g. {list(diffs.items())[:5]}"
    assert got_spark[300] == 0.0  # exact valid_to boundary is NOT current
