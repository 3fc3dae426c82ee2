"""Generate driver-schema-compatible synthetic testdata at larger SFs.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). Scale
cliffs — skew blowups, memory, codegen, shuffle sizing — only show up
beyond that, so this generator emits the same ten tables with the same
schemas, value domains, and distribution shapes (profiled from the
shipped sf0.1: see row-count ratios below) at any sf, for
PERFORMANCE sweeps. It is deliberately NOT the driver's generator —
correctness parity is checked only on the driver's own files; data
from here feeds timing sweeps (tools/sf_sweep.py).

Everything is hash-deterministic (DuckDB's 64-bit hash), no RNG, so
regenerated data is identical across runs/machines.

Row counts at sf=1.0 (10x the shipped sf0.1 profile):
  customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem 6M,
  events 1M (15k users), documents 50k, embeddings 50k; region 5,
  nation 25 fixed.

Usage: python tools/gen_testdata.py --sf 1.0 --out /root/repo/.scratch/sf1
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

MONTH_US = 30 * 24 * 3600 * 1_000_000  # events span one month of micros


def _h(expr: str, salt: int) -> str:
    """Deterministic uniform int64 >= 0 from an expression."""
    # hash() returns UINT64; shift down a bit before casting to BIGINT
    return f"CAST(hash({expr} * 2654435761 + {salt}) >> 2 AS BIGINT)"


def generate(sf: float, out_dir: str) -> None:
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_lineitem = int(6_000_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_docs = int(50_000 * sf)
    n_vecs = int(50_000 * sf)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out / (name + '.parquet')}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out / (name + '.parquet')}')").fetchone()[0]
        print(f"  {name}: {n} rows")

    write(
        "region",
        """
        SELECT * FROM (VALUES (0,'AFRICA'),(1,'AMERICA'),(2,'ASIA'),
          (3,'EUROPE'),(4,'MIDDLE EAST')) v(r_regionkey, r_name)
        """,
    )
    write(
        "nation",
        """
        SELECT CAST(i AS INTEGER) n_nationkey,
               'NATION_' || i n_name,
               CAST(i % 5 AS INTEGER) n_regionkey
        FROM range(25) t(i)
        """,
    )
    write(
        "customer",
        f"""
        SELECT i c_custkey,
               printf('Customer#%09d', i) c_name,
               CAST({_h('i', 11)} % 25 AS INTEGER) c_nationkey,
               round(({_h('i', 12)} % 1100000) / 100.0 - 1000.0, 2) c_acctbal,
               ['MACHINERY','FURNITURE','HOUSEHOLD','BUILDING','AUTOMOBILE']
                 [1 + {_h('i', 13)} % 5] c_mktsegment
        FROM range({n_cust}) t(i)
        """,
    )
    write(
        "supplier",
        f"""
        SELECT i s_suppkey,
               printf('Supplier#%09d', i) s_name,
               CAST({_h('i', 21)} % 25 AS INTEGER) s_nationkey,
               round(({_h('i', 22)} % 1100000) / 100.0 - 1000.0, 2) s_acctbal
        FROM range({n_supp}) t(i)
        """,
    )
    write(
        "part",
        f"""
        SELECT i p_partkey,
               ['blue','old','small','new','large','hot','cold','red']
                 [1 + {_h('i', 31)} % 8] || ' ' ||
               ['widget','gizmo','ring','gear','anvil','bolt','plate','rod']
                 [1 + {_h('i', 32)} % 8] p_name,
               'Brand#' || (1 + {_h('i', 33)} % 25) p_brand,
               ['ECONOMY','LARGE','STANDARD','MEDIUM','SMALL','PROMO']
                 [1 + {_h('i', 34)} % 6] p_type,
               CAST(1 + {_h('i', 35)} % 50 AS INTEGER) p_size,
               round(900.0 + ({_h('i', 36)} % 9990) / 100.0, 2) p_retailprice
        FROM range({n_part}) t(i)
        """,
    )
    # orders: ~10 per customer (hash-uniform custkey => Poisson(10)),
    # dates uniform 1995-01-01 .. 2001-08-01 (2404 days)
    write(
        "orders",
        f"""
        SELECT i o_orderkey,
               {_h('i', 41)} % {n_cust} o_custkey,
               ['O','P','F'][1 + {_h('i', 42)} % 3] o_orderstatus,
               round(1000.0 + ({_h('i', 43)} % 45000000) / 100.0, 2) o_totalprice,
               TIMESTAMP '1995-01-01' + to_days(CAST({_h('i', 44)} % 2404 AS INTEGER)) o_orderdate,
               ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
                 [1 + {_h('i', 45)} % 5] o_orderpriority
        FROM range({n_orders}) t(i)
        """,
    )
    # lineitem: ~4 lines per order via hash-uniform orderkey
    write(
        "lineitem",
        f"""
        SELECT {_h('i', 51)} % {n_orders} l_orderkey,
               {_h('i', 52)} % {n_part} l_partkey,
               {_h('i', 53)} % {n_supp} l_suppkey,
               CAST(1 + {_h('i', 54)} % 7 AS INTEGER) l_linenumber,
               CAST(1 + {_h('i', 55)} % 50 AS DOUBLE) l_quantity,
               round(900.0 + ({_h('i', 56)} % 10410000) / 100.0, 2) l_extendedprice,
               ({_h('i', 57)} % 11) / 100.0 l_discount,
               ({_h('i', 58)} % 9) / 100.0 l_tax,
               ['A','N','R'][1 + {_h('i', 59)} % 3] l_returnflag,
               ['O','F'][1 + {_h('i', 60)} % 2] l_linestatus,
               TIMESTAMP '1995-01-01' + to_days(CAST({_h('i', 61)} % 2500 AS INTEGER)) l_shipdate
        FROM range({n_lineitem}) t(i)
        """,
    )
    write(
        "events",
        f"""
        SELECT i event_id,
               TIMESTAMP '2024-01-01'
                 + to_microseconds({_h('i', 71)} % {MONTH_US}) ts,
               1 + {_h('i', 72)} % {n_users} user_id,
               ['click','signup','error','view','purchase']
                 [1 + {_h('i', 73)} % 5] event_type,
               round(({_h('i', 74)} % 56021) / 100.0, 2) AS "value",
               '{{"k": ' || ({_h('i', 75)} % 100) || '}}' props
        FROM range({n_events}) t(i)
        """,
    )
    # documents: word-salad with a REALISTIC vocabulary mix — 20% from
    # a 24-word hot core (stopword-like, shared by everything) and 80%
    # from a 4000-word synthetic tail, so 3-gram shingles are
    # SELECTIVE at sweep scale (VERDICT r8 #3: the old 24-word-only
    # vocab pushed every shingle's document frequency over any sane
    # cap at sf1 — 24^3 possible shingles across 3M postings — which
    # made the capped candidate paths degenerate to 0 rows and never
    # exercised the operators on their real workload shape). 40-90
    # words, ~40% en / 15% each other lang, 20 sources; plants:
    # exact twins (~0.4%), near-dup twins (~2%, previous doc + one
    # word), and CONTAINMENT snippets (~0.25%, the first 18 words of
    # the previous doc — containment 1.0, jaccard << 1, the
    # syndicated-snippet shape dedup_containment_pairs exists for).
    con.execute(
        """
        CREATE OR REPLACE TEMP MACRO doc_word(h) AS
          CASE WHEN h % 5 = 0 THEN
            ['key','agg','row','scan','slow','fast','table','value','part',
             'hash','batch','window','spark','order','data','column','join',
             'small','filter','stream','merge','query','big','a']
              [1 + (h // 5) % 24]
          ELSE 'w' || CAST((h // 5) % 4000 AS VARCHAR) END
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP MACRO doc_text(i) AS
          array_to_string(
            list_transform(range(90), j ->
              doc_word(CAST(hash(i * 7919 + j) >> 2 AS BIGINT)))
              [1 : 40 + CAST(hash(i * 104729) >> 2 AS BIGINT) % 51],
            ' ')
        """
    )
    write(
        "documents",
        f"""
        WITH base AS (
          SELECT i,
                 CASE
                   WHEN i > 1 AND {_h('i', 81)} % 250 = 0 THEN doc_text(i - 1)
                   WHEN i > 0 AND {_h('i', 82)} % 50 = 0
                     THEN doc_text(i - 1) || ' extra'
                   WHEN i > 0 AND {_h('i', 85)} % 400 = 0
                     THEN array_to_string(
                            string_split(doc_text(i - 1), ' ')[1:18], ' ')
                   ELSE doc_text(i)
                 END AS text
          FROM range({n_docs}) t(i)
        )
        SELECT i doc_id,
               text,
               ['en','en','en','es','zh','de','fr','en']
                 [1 + {_h('i', 83)} % 8] lang,
               'src' || ({_h('i', 84)} % 20) source,
               length(text) n_chars
        FROM base
        """,
    )
    # embeddings: 64-dim, 10 planted clusters (centroid + small noise)
    write(
        "embeddings",
        f"""
        SELECT i vec_id,
               list_transform(range(64), j -> CAST(
                 sin(({_h('i', 91)} % 10) * 64 + j)
                 + 0.15 * sin(i * 131071 + j * 524287) AS FLOAT)) embedding,
               CAST({_h('i', 91)} % 10 AS INTEGER) AS "label"
        FROM range({n_vecs}) t(i)
        """,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    print(f"generating sf={args.sf} -> {args.out}")
    generate(args.sf, args.out)
