"""Regenerate tests/golden/corpus_netcdf.json — the end-to-end snapshot
of the engine's NetCDF output over the reference's own test corpus.

Run from the repo root:  python tools/make_corpus_golden.py

Only run deliberately (after an intentional behavior change), then
review the diff: the committed golden is the regression contract that
tests/test_corpus_golden.py enforces.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    from cioos_siooc_data_transform_spark.session import get_spark
    from tests.corpus_golden_lib import GOLDEN_PATH, dump, snapshot_corpus

    spark = get_spark("make-corpus-golden")
    snap = snapshot_corpus(spark)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        f.write(dump(snap) + "\n")
    print(f"wrote {GOLDEN_PATH}: {len(snap)} files, "
          f"{sum(len(v['variables']) for v in snap.values())} variables")


if __name__ == "__main__":
    main()
