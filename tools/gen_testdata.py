#!/usr/bin/env python3
"""Scale-probe testdata generator (driver-schema compatible).

Usage: python3 tools/gen_testdata.py <sf> <out_dir> [--grow-domains]

Produces the same ten tables as the driver's /root/testdata/sf* dirs —
identical parquet schemas (including events' TIMESTAMP(NANOS) ts and
embeddings' list<float>) and matching value inventories/distributions
(measured from sf0.1) — at an arbitrary scale factor, so the bench can
be run above the driver-provided sf0.1. NOT a bit-replica of the
driver's seed-42 stream; correctness stays gated on the driver data at
sf0.01, this data exists purely to measure how runtimes scale.

Row counts follow the driver's observed scaling:
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem ~6M*sf (1-7 lines per order), events 1M*sf (15k*sf users),
  documents 50k*sf (20 fixed sources, 31-word vocab), embeddings
  2000*(10*sf)^0.602 (the driver's 4x-per-decade pattern: 500@0.01,
  2000@0.1 -> 8000@1).

--grow-domains: real corpora grow their VALUE DOMAINS with size; the
fixed mode above pins them (20 sources, 31 words, 64 part names), which
makes several probe ANSWERS quadratic by construction (every doc pair
shares most words, every part shares a name with n/64 others) and says
nothing about the engine. Grow mode scales the domains with sf the way
real data does, anchored so sf <= 0.1 reproduces the fixed mode:
  vocabulary   V = max(31, 30*sqrt(total_tokens))   (Heaps' law, K=30,
               beta=0.5), words drawn Zipf(1/rank) so a head of common
               words persists while the tail grows;
  sources      max(20, 200*sf);
  part names   adjective/noun lists grown by sqrt(sf/0.1) each, so
               distinct names grow ~ sf and lev<=3 collisions stay a
               bounded fraction instead of covering the whole table.
(The spatial grid the probes exercise is DERIVED inside the queries
from supplier cardinality — area ~ rows, constant density — so it needs
no generator support; see GeoQueries.SpatialGrid.)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
         'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
         'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
         'spark', 'stream', 'table', 'the', 'value', 'vector', 'window']
SEGMENTS = ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
PRIORITIES = ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW']
PTYPES = ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD']
ADJS = ['blue', 'cold', 'hot', 'large', 'new', 'old', 'red', 'small']
NOUNS = ['anvil', 'bolt', 'gear', 'gizmo', 'plate', 'ring', 'rod', 'widget']
EVTYPES = ['click', 'error', 'purchase', 'signup', 'view']
LANGS = ['de', 'en', 'es', 'fr', 'zh']
LANGP = [0.14, 0.42, 0.15, 0.145, 0.145]
REGIONS = ['AFRICA', 'AMERICA', 'ASIA', 'EUROPE', 'MIDDLE EAST']

MS_DAY = 86_400_000


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f'{name}.parquet'))
    print(f'  {name}: {table.num_rows} rows')


def ts_ms(rng, n, start_day, end_day):
    """timestamp[ms] array uniform over [start, end) days since epoch."""
    ms = rng.integers(start_day * MS_DAY, end_day * MS_DAY, n)
    return pa.array(ms, type=pa.timestamp('ms'))


def grown_words(rng, n_new, taken):
    """Deterministic letter-string tokens, distinct from `taken`."""
    out = []
    while len(out) < n_new:
        k = rng.integers(3, 8)
        w = ''.join(chr(ord('a') + c) for c in rng.integers(0, 26, k))
        if w not in taken:
            taken.add(w)
            out.append(w)
    return out


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    grow = '--grow-domains' in sys.argv[3:]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(round(2000 * (10 * sf) ** 0.602))
    n_users = int(15_000 * sf)

    write(out, 'region', pa.table({
        'r_regionkey': pa.array(range(5), pa.int64()),
        'r_name': REGIONS,
    }))
    write(out, 'nation', pa.table({
        'n_nationkey': pa.array(range(25), pa.int64()),
        'n_name': [f'NATION_{i}' for i in range(25)],
        'n_regionkey': pa.array([i % 5 for i in range(25)], pa.int64()),
    }))
    write(out, 'customer', pa.table({
        'c_custkey': pa.array(range(n_cust), pa.int64()),
        'c_name': [f'Customer#{i:09d}' for i in range(n_cust)],
        'c_nationkey': pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        'c_acctbal': np.round(rng.uniform(0, 10_000, n_cust), 2),
        'c_mktsegment': pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    write(out, 'supplier', pa.table({
        's_suppkey': pa.array(range(n_supp), pa.int64()),
        's_name': [f'Supplier#{i:09d}' for i in range(n_supp)],
        's_nationkey': pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        's_acctbal': np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))
    adjs, nouns = list(ADJS), list(NOUNS)
    if grow and sf > 0.1:
        lists_scale = (sf / 0.1) ** 0.5  # names = adjs*nouns ~ sf
        taken = set(adjs) | set(nouns)
        adjs += grown_words(rng, round(len(ADJS) * lists_scale) - len(ADJS), taken)
        nouns += grown_words(rng, round(len(NOUNS) * lists_scale) - len(NOUNS), taken)
    adj = np.array(adjs)[rng.integers(0, len(adjs), n_part)]
    noun = np.array(nouns)[rng.integers(0, len(nouns), n_part)]
    write(out, 'part', pa.table({
        'p_partkey': pa.array(range(n_part), pa.int64()),
        'p_name': [f'{a} {b}' for a, b in zip(adj, noun)],
        'p_brand': [f'Brand#{i}' for i in rng.integers(1, 26, n_part)],
        'p_type': pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        'p_size': pa.array(rng.integers(1, 51, n_part), pa.int32()),
        'p_retailprice': np.round(900 + np.arange(n_part) * 0.1, 2),
    }))
    day0, day1 = 9131, 11536  # 1995-01-01 .. 2001-08-01 (days since epoch)
    write(out, 'orders', pa.table({
        'o_orderkey': pa.array(range(n_ord), pa.int64()),
        'o_custkey': pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        'o_orderstatus': pa.array(np.array(['F', 'O', 'P'])[rng.integers(0, 3, n_ord)]),
        'o_totalprice': np.round(rng.uniform(1000, 500_000, n_ord), 2),
        'o_orderdate': ts_ms(rng, n_ord, day0, day1),
        'o_orderpriority': pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    lines_per = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_ok)
    l_ln = np.concatenate([np.arange(1, k + 1) for k in lines_per])
    write(out, 'lineitem', pa.table({
        'l_orderkey': pa.array(l_ok, pa.int64()),
        'l_partkey': pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        'l_suppkey': pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        'l_linenumber': pa.array(l_ln, pa.int32()),
        'l_quantity': rng.integers(1, 51, n_li).astype(np.float64),
        'l_extendedprice': np.round(rng.uniform(900, 105_000, n_li), 2),
        'l_discount': np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        'l_tax': np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        'l_returnflag': pa.array(np.array(['A', 'N', 'R'])[rng.integers(0, 3, n_li)]),
        'l_linestatus': pa.array(np.array(['F', 'O'])[rng.integers(0, 2, n_li)]),
        'l_shipdate': ts_ms(rng, n_li, day0, day1 + 95),
    }))
    # events: ts is TIMESTAMP(NANOS) over 2024-01-01..2024-01-31
    ev_day0 = 19723  # 2024-01-01
    ns = (rng.integers(ev_day0 * MS_DAY, (ev_day0 + 30) * MS_DAY, n_ev)
          * 1_000_000 + rng.integers(0, 1_000_000, n_ev))
    write(out, 'events', pa.table({
        'event_id': pa.array(range(n_ev), pa.int64()),
        'ts': pa.array(ns, pa.timestamp('ns')),
        'user_id': pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        'event_type': pa.array(np.array(EVTYPES)[rng.integers(0, 5, n_ev)]),
        'value': np.round(rng.uniform(0, 560, n_ev), 2),
        'props': [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))
    n_words = rng.integers(10, 101, n_doc)
    n_src = 20
    if grow:
        total_tokens = int(n_words.sum())
        v_size = max(len(VOCAB), round(30 * total_tokens ** 0.5))
        taken = set(VOCAB)
        vocab = np.array(list(VOCAB) +
                         grown_words(rng, v_size - len(VOCAB), taken))
        # Zipf(1/rank): a persistent head of common words, a tail that
        # grows with the corpus — the collision structure Heaps' law
        # actually produces (uniform over a huge vocab would kill ALL
        # collisions, which is as unrealistic as the 31-word fixed mode)
        p = 1.0 / np.arange(1, len(vocab) + 1)
        cum = np.cumsum(p / p.sum())
        flat = vocab[np.searchsorted(cum, rng.random(int(n_words.sum())))]
        bounds = np.concatenate([[0], np.cumsum(n_words)])
        texts = [' '.join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_doc)]
        n_src = max(20, int(200 * sf))
    else:
        vocab = np.array(VOCAB)
        texts = [' '.join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words]
    write(out, 'documents', pa.table({
        'doc_id': pa.array(range(n_doc), pa.int64()),
        'text': texts,
        'lang': pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANGP)]),
        'source': [f'src{i}' for i in rng.integers(0, n_src, n_doc)],
        'n_chars': pa.array([len(t) for t in texts], pa.int64()),
    }))
    vecs = rng.normal(0, 1, (n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    write(out, 'embeddings', pa.table({
        'vec_id': pa.array(range(n_emb), pa.int64()),
        'embedding': pa.array(list(vecs), pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == '__main__':
    main()
