"""Local mirror of the driver's correctness gate.

Runs a contract query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, schema shape, and values
order-insensitively — catching cross-engine drift (float summation order,
type widening, tie-breaks) *before* the driver does.

Comparison is stricter than a hash: values are matched cell-by-cell after
canonical sorting, with a tiny absolute tolerance for floats (queries are
designed to be exact after their explicit ROUNDs; the tolerance only
guards the comparison itself, not the engine).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by stringified
    values (mirrors the driver's order-insensitive compare)."""
    out = df.reindex(sorted(df.columns), axis=1).copy()
    if len(out) == 0:
        return out
    key = out.astype(str).agg("\x00".join, axis=1)
    out = out.iloc[key.argsort(kind="stable").to_numpy()].reset_index(drop=True)
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        detail = "" if self.ok else " :: " + "; ".join(self.problems[:5])
        return f"[{status}] {self.name}{detail}"


def _is_na(v: object) -> bool:
    """Null-ish scalar test covering None, float NaN, and pandas NaT."""
    if v is None:
        return True
    try:
        r = pd.isna(v)
    except (TypeError, ValueError):
        return False
    return bool(r) if not hasattr(r, "__len__") else False


def _values_equal(a: object, b: object, tol: float = 1e-9) -> bool:
    if _is_na(a) or _is_na(b):
        return _is_na(a) and _is_na(b)
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return (a is None or (isinstance(a, float) and math.isnan(a))) and (
                b is None or (isinstance(b, float) and math.isnan(b))
            )
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b


def compare(
    name: str, spark_df: DataFrame, oracle_df: pd.DataFrame, strict: bool = False
) -> CompareResult:
    """``strict=False`` mirrors the local tolerance check; ``strict=True``
    additionally requires float cells to be BIT-identical — the predictor
    for the driver's value-hash gate, which has no tolerance. A query that
    passes loose but fails strict will pass our tests and then fail the
    driver (round-1 q_derive_arith did exactly this); run the strict form
    over the registry before shipping float-producing queries."""
    res = CompareResult(name, True)
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_df)
    if list(got.columns) != list(want.columns):
        res.ok = False
        res.problems.append(f"columns {list(got.columns)} != {list(want.columns)}")
        return res
    if len(got) != len(want):
        res.ok = False
        res.problems.append(f"row count {len(got)} != {len(want)}")
        return res
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        bad = [
            (i, g, w)
            for i, (g, w) in enumerate(zip(gv, wv))
            if not (
                _values_bit_equal(_py(g), _py(w)) if strict else _values_equal(_py(g), _py(w))
            )
        ]
        if bad:
            res.ok = False
            i, g, w = bad[0]
            res.problems.append(f"col {col}: {len(bad)} mismatches, first at row {i}: {g!r} != {w!r}")
    return res


def _values_bit_equal(a: object, b: object) -> bool:
    """Exact equality with null/NaN normalization (NaT==NaT, NaN==NaN) —
    no float tolerance, matching a value-hash comparison."""
    if _is_na(a) or _is_na(b):
        return _is_na(a) and _is_na(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return a == b
    return a == b


def _py(v: object) -> object:
    """Normalize pandas/numpy scalars to plain Python for comparison."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None if False else v
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def check_query(
    spark: SparkSession, name: str, sf_dir: str, strict: bool = False
) -> CompareResult:
    """Run one contract query against its oracle (or rows-only smoke)."""
    from .plans import load_registry

    cq = load_registry()[name]
    df = cq.build(spark, sf_dir)
    if cq.oracle is None:
        n = df.count()
        return CompareResult(name, True, [f"rows-only: {n} rows"])
    return compare(name, df, run_oracle(cq.oracle, sf_dir), strict=strict)


def sweep(
    spark: SparkSession, sf_dir: str, strict: bool = True, names: list[str] | None = None
) -> list[CompareResult]:
    """The full-registry driver-mirror sweep (the pre-ship gate the verify
    recipe prescribes): every contract query vs its DuckDB oracle in ONE
    Spark session, strict (bit-identical floats — the driver's value-hash
    predictor) by default. Prints each result as it lands; returns all."""
    from .plans import load_registry

    results: list[CompareResult] = []
    for name in names if names is not None else list(load_registry()):
        try:
            res = check_query(spark, name, sf_dir, strict=strict)
        except Exception as exc:  # a crash is a failure, not an abort
            res = CompareResult(name, False, [f"{type(exc).__name__}: {exc}"])
        print(res, flush=True)
        results.append(res)
    return results


if __name__ == "__main__":  # pragma: no cover - maintenance CLI
    # python -m simple_pos_kafka_pyspark_airflow_spark.testing [sf_dir] [--loose]
    import sys
    import time

    from .session import get_session

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.01"
    t0 = time.time()
    out = sweep(get_session("strict_sweep"), sf, strict="--loose" not in sys.argv)
    bad = [r.name for r in out if not r.ok]
    print(
        f"SWEEP {'FAILED' if bad else 'OK'} in {time.time() - t0:.0f}s: "
        f"{len(out) - len(bad)}/{len(out)} green"
        + (f"; failures: {bad}" if bad else "")
    )
    sys.exit(1 if bad else 0)
