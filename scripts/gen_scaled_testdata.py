#!/usr/bin/env python
"""Generate a scaled copy of the benchmark testdata for scale rehearsals.

Reproduces SCALE.md's "10x scale rehearsal" inputs on demand:

    python scripts/gen_scaled_testdata.py --sf 1.0 --out /tmp/sf1.0
    python bench.py --sf /tmp/sf1.0 --subset heavy

Same schemas and distributions as /root/testdata/sf* (seeded
np.random.default_rng, single stream, tables drawn in a fixed order) so
heavyweight-operator timings at --sf 1.0 are directly comparable with
the sf0.1 bench at 10x the data: 6M lineitem, 1.5M orders, 200k parts,
1M events, 50k documents, 20k embeddings.

SAFETY: refuses to write anywhere under /root/testdata — that tree is
driver-owned, read-only by contract (and the one writable subdir has
been clobbered by a stray argv before; see SCALE.md).
"""

from __future__ import annotations

import argparse
import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
ADJ = ["red", "blue", "small", "large", "hot", "cold", "old", "new"]
NOUN = ["anvil", "widget", "gizmo", "bolt", "gear", "plate", "rod", "ring"]
PTYPE = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
OSTAT = ["O", "F", "P"]
OPRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RFLAG = ["R", "A", "N"]
LSTAT = ["O", "F"]
ETYPE = ["click", "view", "purchase", "signup", "error"]
LANGS7 = ["en", "en", "en", "de", "fr", "es", "zh"]
VOCAB = [
    "the", "a", "spark", "query", "table", "join", "group", "filter",
    "window", "data", "order", "customer", "part", "line", "fast",
    "slow", "big", "small", "hash", "sort", "merge", "scan", "agg",
    "stream", "batch", "vector", "key", "value", "row", "column",
]
EPOCH_ORDERS = datetime.datetime(1995, 1, 1)
EPOCH_EVENTS = datetime.datetime(2024, 1, 1)


def sizes(sf: float) -> dict[str, int]:
    return dict(
        Nc=int(150000 * sf), Ns=int(10000 * sf), Np=int(200000 * sf),
        No=int(1500000 * sf), Nl=int(6000000 * sf), Ne=int(1000000 * sf),
        Nd=max(500, int(50000 * sf)), Nv=max(500, int(20000 * sf)),
    )


def generate(sf: float, seed: int = 42) -> dict[str, dict]:
    z = sizes(sf)
    Nc, Ns, Np, No, Nl, Ne, Nd, Nv = (
        z[k] for k in ("Nc", "Ns", "Np", "No", "Nl", "Ne", "Nd", "Nv")
    )
    rng = np.random.default_rng(seed)
    out: dict[str, dict] = {}
    out["region"] = dict(
        r_regionkey=np.arange(5, dtype=np.int32),
        r_name=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    )
    out["nation"] = dict(
        n_nationkey=np.arange(25, dtype=np.int32),
        n_name=[f"NATION_{i}" for i in range(25)],
        n_regionkey=(np.arange(25) % 5).astype(np.int32),
    )
    out["customer"] = dict(
        c_custkey=np.arange(Nc, dtype=np.int64),
        c_name=[f"Customer#{i:09d}" for i in range(Nc)],
        c_nationkey=rng.integers(0, 25, Nc).astype(np.int32),
        c_acctbal=np.round(rng.uniform(-999.99, 9999.99, Nc), 2),
        c_mktsegment=list(rng.choice(SEGS, Nc)),
    )
    out["supplier"] = dict(
        s_suppkey=np.arange(Ns, dtype=np.int64),
        s_name=[f"Supplier#{i:09d}" for i in range(Ns)],
        s_nationkey=rng.integers(0, 25, Ns).astype(np.int32),
        s_acctbal=np.round(rng.uniform(-999.99, 9999.99, Ns), 2),
    )
    adj = rng.integers(0, 8, Np)
    noun = rng.integers(0, 8, Np)
    brand = rng.integers(1, 26, Np)
    ptype = rng.integers(0, 6, Np)
    psize = rng.integers(1, 51, Np)
    out["part"] = dict(
        p_partkey=np.arange(Np, dtype=np.int64),
        p_name=[f"{ADJ[a]} {NOUN[n]}" for a, n in zip(adj, noun)],
        p_brand=[f"Brand#{b}" for b in brand],
        p_type=[PTYPE[t] for t in ptype],
        p_size=psize.astype(np.int32),
        p_retailprice=np.round(900 + (np.arange(Np) % 1000) / 10, 2),
    )
    ock = rng.integers(0, Nc, No)
    ost = rng.integers(0, 3, No)
    otp = np.round(rng.uniform(1000, 500000, No), 2)
    odt = rng.integers(0, 2405, No)
    opr = rng.integers(0, 5, No)
    out["orders"] = dict(
        o_orderkey=np.arange(No, dtype=np.int64),
        o_custkey=ock.astype(np.int64),
        o_orderstatus=[OSTAT[i] for i in ost],
        o_totalprice=otp,
        o_orderdate=[
            EPOCH_ORDERS + datetime.timedelta(days=int(d)) for d in odt
        ],
        o_orderpriority=[OPRIO[i] for i in opr],
    )
    lok = rng.integers(0, No, Nl)
    lpk = rng.integers(0, Np, Nl)
    lsk = rng.integers(0, Ns, Nl)
    lln = rng.integers(1, 8, Nl)
    lq = rng.integers(1, 51, Nl)
    lep = np.round(rng.uniform(900, 105000, Nl), 2)
    ldis = np.round(rng.uniform(0, 0.1, Nl), 2)
    ltax = np.round(rng.uniform(0, 0.08, Nl), 2)
    lrf = rng.integers(0, 3, Nl)
    lls = rng.integers(0, 2, Nl)
    lsd = rng.integers(1, 2500, Nl)
    out["lineitem"] = dict(
        l_orderkey=lok.astype(np.int64),
        l_partkey=lpk.astype(np.int64),
        l_suppkey=lsk.astype(np.int64),
        l_linenumber=lln.astype(np.int32),
        l_quantity=lq.astype(np.float64),
        l_extendedprice=lep,
        l_discount=ldis,
        l_tax=ltax,
        l_returnflag=[RFLAG[i] for i in lrf],
        l_linestatus=[LSTAT[i] for i in lls],
        l_shipdate=[
            EPOCH_ORDERS + datetime.timedelta(days=int(d)) for d in lsd
        ],
    )
    ets = np.sort(rng.uniform(0, 30 * 86400, Ne))
    euid = rng.integers(0, Nc // 10, Ne)
    eet = rng.integers(0, 5, Ne)
    eval_ = np.round(rng.exponential(50, Ne), 2)
    ek = rng.integers(0, 100, Ne)
    out["events"] = dict(
        event_id=np.arange(Ne, dtype=np.int64),
        ts=[
            EPOCH_EVENTS + datetime.timedelta(seconds=float(s)) for s in ets
        ],
        user_id=euid.astype(np.int64),
        event_type=[ETYPE[i] for i in eet],
        value=eval_,
        props=[f'{{"k": {k}}}' for k in ek],
    )
    docs = []
    for _ in range(Nd):
        n = int(rng.integers(10, 100))
        idx = rng.integers(0, 30, n)
        docs.append(" ".join(VOCAB[int(i)] for i in idx))
    t = rng.choice(Nd, Nd // 20, replace=False)
    s = rng.integers(0, Nd, Nd // 20)
    for k in range(Nd // 20):
        docs[int(t[k])] = docs[int(s[k])] + " dup"
    lg = rng.integers(0, 7, Nd)
    out["documents"] = dict(
        doc_id=np.arange(Nd, dtype=np.int64),
        text=docs,
        lang=[LANGS7[i] for i in lg],
        source=[f"src{d % 20}" for d in range(Nd)],
        n_chars=np.array([len(t_) for t_ in docs], dtype=np.int64),
    )
    g = rng.standard_normal((Nv, 64)).astype(np.float32)
    g = g / np.linalg.norm(g, axis=1, keepdims=True).astype(np.float32)
    lab = rng.integers(0, 10, Nv)
    out["embeddings"] = dict(
        vec_id=np.arange(Nv, dtype=np.int64),
        embedding=[r for r in g],
        label=lab.astype(np.int32),
    )
    return out


def write_parquet(tables: dict[str, dict], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, cols in tables.items():
        pq.write_table(
            pa.table({k: pa.array(v) for k, v in cols.items()}),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, required=True, help="scale factor")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    real_out = os.path.realpath(args.out)
    if real_out == "/root/testdata" or real_out.startswith("/root/testdata/"):
        raise SystemExit(
            "refusing to write under /root/testdata (driver-owned)"
        )

    tables = generate(args.sf, args.seed)
    write_parquet(tables, real_out)
    for name, cols in tables.items():
        n = len(next(iter(cols.values())))
        print(f"{name}: {n} rows")
    print(f"wrote {len(tables)} tables to {real_out}")


if __name__ == "__main__":
    main()
