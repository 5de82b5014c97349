"""Driver-mimic: run each queries() entry and its oracle_sql() twin on the
same sf_dir, compare row count, schema and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    try:
        import ray.data as rd
        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("ORACLE_CPUS", "8")),
             include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    # call-time registry merge (round-4 VERDICT item 8): the sweep can
    # never lag a registration the way an import-time snapshot can
    from nacc_form_validator_ray.pipelines.queries import (
        all_oracle_sql, all_queries, flagship_oracles)
    QUERIES = all_queries()
    oracle = all_oracle_sql()
    oracle.update(flagship_oracles(sf_dir))

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        ray_df = canon(to_pandas(fn(sf_dir)))
        if name not in oracle:
            print(f"{name:28s} rows-only  n={len(ray_df)}")
            continue
        sql_df = canon(con.sql(oracle[name]).df())
        status = "OK"
        detail = ""
        if len(ray_df) != len(sql_df):
            status = "ROWS"
            detail = f"ray={len(ray_df)} sql={len(sql_df)}"
        elif list(ray_df.columns) != list(sql_df.columns):
            status = "SCHEMA"
            detail = f"ray={list(ray_df.columns)} sql={list(sql_df.columns)}"
        else:
            dtypes_ray = [str(t) for t in ray_df.dtypes]
            dtypes_sql = [str(t) for t in sql_df.dtypes]
            if dtypes_ray != dtypes_sql:
                status = "DTYPES"
                detail = f"ray={dtypes_ray} sql={dtypes_sql}"
            elif not ray_df.equals(sql_df):
                status = "VALUES"
                neq = (ray_df != sql_df).any(axis=1)
                detail = (f"{int(neq.sum())} differing rows; first:\n"
                          f"ray:\n{ray_df[neq].head(3)}\n"
                          f"sql:\n{sql_df[neq].head(3)}")
        print(f"{name:28s} {status:6s} n={len(ray_df)} {detail[:400]}")
        if status != "OK":
            failures.append(name)

    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
