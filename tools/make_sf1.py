#!/usr/bin/env python3
"""Dev-only sf1-scale corpus synthesis for the gate dry-run.

The driver ships testdata at sf0.001/0.01/0.1 only. For the round-7
"prove sf1 empirically" item this builds a 10x replication of the
sf0.1 documents and embeddings tables (id-shifted so keys stay dense
and unique, payloads verbatim) into an output dir. Both engines read
the SAME parquet, so the oracle comparison is as meaningful as on
driver data; the replication makes every document a member of a
`copies`-member duplicate family, which stresses the dedup/candidate
paths harder than organic data at the same row count.

Usage: python3 tools/make_sf1.py [outdir] [copies]
(defaults /tmp/sf1_synth, 10); main(out, copies) takes the factor as
a parameter, so imports replicate what they ask for — the CLI arg is
not a global rebind. copies=3 is the MID-SIZE certification tier (r10 verdict item 5): big enough that megaclusters and the
replicated dup families exist, small enough that the recursive-CTE /
exact-Jaccard oracles (q242-q244) fit the VM's DuckDB spill budget.
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main(out: str, copies: int = COPIES) -> None:
    con = duckdb.connect()
    ndoc = con.execute(
        f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    nvec = con.execute(
        f"SELECT max(vec_id)+1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT doc_id + {ndoc} * c.i AS doc_id, text, lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               (SELECT UNNEST(range({copies})) AS i) c
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT vec_id + {nvec} * c.i AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet'),
               (SELECT UNNEST(range({copies})) AS i) c
          ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in ("documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    import os
    os.makedirs(out, exist_ok=True)
    main(out, n_copies)
