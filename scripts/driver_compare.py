#!/usr/bin/env python3
"""Local replica of the driver's correctness compare (stricter than
np.allclose): sorts columns BY NAME, sorts rows, and hashes VALUES with
pandas' dtype-sensitive hash — a Decimal-object column vs a float64
column hash-differs even when numerically equal, which is exactly the
round-2 q01/q02/q09/q10 failure mode the allclose compare missed.

Usage: python3 scripts/driver_compare.py /tmp/vout /root/testdata/sf0.01
"""
import sys, glob, json
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ['documents', 'embeddings', 'events', 'orders', 'customer',
          'nation', 'lineitem', 'region', 'supplier', 'part']


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind='mergesort')
    return df.reset_index(drop=True)


def value_hash(df):
    return pd.util.hash_pandas_object(df, index=False).sum()


def main(outdir, sfdir):
    sqls = {k: v for k, v in json.load(open(f'{outdir}/oracle_sql.json')).items()
            if not k.endswith('.parquet')}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    failures = 0
    for name in sorted(glob.glob(f'{outdir}/*.parquet')):
        qname = name.split('/')[-1].removesuffix('.parquet')
        # read the whole directory: a multi-part output read via its
        # first part file alone would silently compare partial data
        b = pq.read_table(name).to_pandas()
        if qname not in sqls:
            status = f'rows-only ({len(b)} rows)' if len(b) > 0 else 'EMPTY'
            failures += len(b) == 0
            print(f'{qname:28s} {status}')
            continue
        a = con.execute(sqls[qname]).fetchdf()
        rows = a.shape == b.shape
        schema = sorted(a.columns) == sorted(b.columns)
        if not (rows and schema):
            print(f'{qname:28s} SHAPE MISMATCH spark={b.shape} oracle={a.shape}')
            failures += 1
            continue
        a, b = norm(a), norm(b)
        # benign pattern: Spark decimal(p<=18) arrives as Decimal objects
        # while THIS duckdb build fetches DECIMAL(18,2) as float64 — the
        # driver's duckdb keeps both as Decimal (q03/q08 passed r2 in this
        # exact form). Coerce to float for the value check, note it.
        coerced = []
        for c in a.columns:
            if {str(a[c].dtype), str(b[c].dtype)} == {'float64', 'object'}:
                a[c] = a[c].astype(float)
                b[c] = b[c].astype(float)
                coerced.append(c)
        dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
              if str(a[c].dtype) != str(b[c].dtype)]
        h = value_hash(a) == value_hash(b)
        if h:
            note = f' (decimal~float coerced: {coerced})' if coerced else ''
            print(f'{qname:28s} OK (hash){note}')
        else:
            failures += 1
            eq = None if dt else (a == b).all().all()
            print(f'{qname:28s} HASH MISMATCH dtypes={dt} values_equal={eq}')
            if not dt:
                diff = (a != b).any(axis=1)
                print(a[diff].head(3))
                print(b[diff].head(3))
    sys.exit(1 if failures else 0)


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/vout',
         sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01')
