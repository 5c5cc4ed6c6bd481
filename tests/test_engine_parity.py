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
