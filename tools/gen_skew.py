#!/usr/bin/env python3
"""Skewed spatial-corpus variants for the SURVEY H3 "Manhattan" probe.

Usage: python3 tools/gen_skew.py <src_dir> <out_dir> <mode>

Modes (both rewrite supplier/customer only; every other table is
symlinked from src so the full catalogue still runs):

  layer     ~50% of polygons (supplier rows) and probe points
            (customer rows) moved to layer 0 — the judge's literal
            "one layer = Manhattan" scenario. Geometry is untouched,
            so spatial density stays uniform; this isolates the
            layer-key component of the join key.

  downtown  layer skew PLUS geometric concentration: 25% of each
            side's rows remapped onto a ~20-cell diagonal "downtown"
            strip. Positions are key-derived in the engine
            (x = key % gw etc., graft SpatialGrid), so the skew is
            expressed by remapping keys: new_key = HI + j + m*lcm(gw,gh)
            puts the row at diagonal position j regardless of m, and
            the HI offset keeps new keys disjoint from kept ones.
            This is the stress arm: hot cells get ~40x the average
            polygon AND point population at sf10.

Grid moduli replicate graft.operators.GeoQueries.SpatialGrid.moduli:
scale = sqrt(n_supplier / 1000); gw,gh,pw,ph = max(base, floor(base *
scale)) for bases 97,89,95,87. CellSize = 16.
"""
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

DIAG_POSITIONS = 320      # 20 cells of 16 along the diagonal
DOWNTOWN_STRIDE = 4       # every 4th row moves downtown (25%)


def moduli(n_supp):
    scale = math.sqrt(n_supp / 1000.0)
    def m(base):
        return max(base, math.floor(base * scale))
    return m(97), m(89), m(95), m(87)


def remap_keys(keys, lcm_wh, mode):
    """Layer: keys unchanged. Downtown: every DOWNTOWN_STRIDE-th row
    gets key HI + j + m*lcm — position j on the diagonal, ids disjoint
    from the kept range (HI > every original key)."""
    if mode == "layer":
        return keys
    hi = lcm_wh * 1000
    out = []
    moved = 0
    for i, k in enumerate(keys):
        if i % DOWNTOWN_STRIDE == 0:
            j = moved % DIAG_POSITIONS
            m = moved // DIAG_POSITIONS
            out.append(hi + j + m * lcm_wh)
            moved += 1
        else:
            out.append(k)
    return out


def skew_layers(keys, layers):
    """~50% of rows (even positional index) to layer 0."""
    return [0 if i % 2 == 0 else v for i, v in enumerate(layers)]


def main():
    src, out, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    assert mode in ("layer", "downtown"), mode
    os.makedirs(out, exist_ok=True)

    supp = pq.read_table(os.path.join(src, "supplier.parquet"))
    cust = pq.read_table(os.path.join(src, "customer.parquet"))
    n_supp = supp.num_rows
    gw, gh, pw, ph = moduli(n_supp)
    lcm_poly = gw * gh // math.gcd(gw, gh)
    lcm_pt = pw * ph // math.gcd(pw, ph)

    s_keys = remap_keys(supp.column("s_suppkey").to_pylist(), lcm_poly, mode)
    s_layers = skew_layers(s_keys, supp.column("s_nationkey").to_pylist())
    supp = supp.set_column(0, "s_suppkey", pa.array(s_keys, pa.int64()))
    supp = supp.set_column(
        supp.schema.get_field_index("s_nationkey"),
        "s_nationkey", pa.array(s_layers, pa.int32()))

    c_keys = remap_keys(cust.column("c_custkey").to_pylist(), lcm_pt, mode)
    c_layers = skew_layers(c_keys, cust.column("c_nationkey").to_pylist())
    cust = cust.set_column(0, "c_custkey", pa.array(c_keys, pa.int64()))
    cust = cust.set_column(
        cust.schema.get_field_index("c_nationkey"),
        "c_nationkey", pa.array(c_layers, pa.int32()))

    pq.write_table(supp, os.path.join(out, "supplier.parquet"))
    pq.write_table(cust, os.path.join(out, "customer.parquet"))
    for t in TABLES:
        if t in ("supplier", "customer"):
            continue
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(os.path.join(src, f"{t}.parquet")), dst)

    l0 = sum(1 for v in s_layers if v == 0) / len(s_layers)
    print(f"{out}: mode={mode} suppliers={n_supp} layer0={l0:.0%} "
          f"grid=({gw},{gh},{pw},{ph})")


if __name__ == "__main__":
    main()
