#!/usr/bin/env python
"""Physical-layout perturbation fixture: permuted rows, tiny row groups.

Fifth matrix axis (r14). The four existing axes vary the DATA
(scale, content distribution, key skew); this one keeps the sf0.01
contract data byte-identical in VALUE but destroys every physical-order
property: rows are shuffled with a seeded permutation and rewritten
with a small row-group size (4096), so Spark scans the tables as many
splits in a different order than the contract file layout.

The driver's hash compare is order-insensitive, so the ONLY divergence
channel this axis can fire is genuine nondeterminism — a LIMIT after a
non-unique ORDER BY, an unsorted collect_list flowing into a
row-visible value, first()/any_value without an ordering, layout-
sensitive ids. SURVEY §2.2's determinism rules claim none exist in the
registry; this fixture is the measurement of that claim.

Usage: python tools/gen_permute.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def generate(src: str, out: str, seed: int = 1729) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        perm = rng.permutation(t.num_rows)
        pq.write_table(
            t.take(perm),
            os.path.join(out, f"{name}.parquet"),
            row_group_size=4096,
        )
        print(f"{name}: {t.num_rows} rows permuted", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/cds_etl_spark_wh/permute/sf0.01"
    )
    generate(src, out)
    print(out)
