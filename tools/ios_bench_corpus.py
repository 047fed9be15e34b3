"""Synthetic IOS-format bench corpus (round-5 verdict item 5).

The relational queries are benchmarked; the whole-file ingest vertical
(sources/ios_source.py: binaryFile scan → mapInPandas parse) was only
correctness-tested on the reference's 35-file corpus. This writes a
few-thousand-file deterministic corpus (same *FILE/$TABLE template the
property tests round-trip, varied per file by a seeded PRNG) so
bench.py can report a files/s number comparable with the reference's
serial converter (BASELINE.md: ~0.19 files/s single-core).

The corpus lands under spark-warehouse/ (gitignored scratch); it is
regenerated only when absent, keyed by a version stamp in the dir name
so a template change invalidates the cache.
"""

from __future__ import annotations

import os
import random

N_FILES_DEFAULT = 5000
_VERSION = "v1"


def _render_file(rng: random.Random, n_channels: int, n_records: int) -> str:
    width = 10
    ch_rows = "\n".join(
        f"       {i + 1} Chan{i + 1:02d}          n/a      0        1"
        for i in range(n_channels)
    )
    det_rows = "\n".join(
        f"       {i + 1}  -99   ' '       {width}  F       ' '     2"
        for i in range(n_channels)
    )
    body_lines = []
    for _ in range(n_records):
        row = (round(rng.uniform(-50.0, 50.0), 2) for _ in range(n_channels))
        body_lines.append("".join(f"{v:{width}.2f}".rjust(width) for v in row))
    body = "\n".join(body_lines)
    hh = rng.randrange(24)
    return f"""*2024/01/01 {hh:02d}:00:00.00
*IOS HEADER VERSION 2.0      2016/04/28 2016/06/13

*FILE
    START TIME          : UTC 2024/01/01 {hh:02d}:00:00.000
    NUMBER OF RECORDS   : {n_records}
    DATA DESCRIPTION    : CTD
    NUMBER OF CHANNELS  : {n_channels}

    $TABLE: CHANNELS
    ! No Name            Units    Minimum  Maximum
    !--- --------------- -------- -------- --------
{ch_rows}
    $END

    $TABLE: CHANNEL DETAIL
    ! No  Pad   Start  Width  Format  Type  Decimal_Places
    !---  ----  -----  -----  ------  ----  --------------
{det_rows}
    $END

*LOCATION
    LATITUDE            :  49  30.00000 N  ! (deg min)
    LONGITUDE           : 123  15.00000 W  ! (deg min)

*END OF HEADER
{body}
"""


def ensure_corpus(n_files: int = N_FILES_DEFAULT, base_dir: str | None = None) -> str:
    """Write the corpus once; return its directory. Deterministic for a
    fixed (n_files, version)."""
    if base_dir is None:
        base_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            if "__file__" in globals()
            else os.getcwd(),
            "spark-warehouse",
        )
    out = os.path.join(base_dir, f"ios_bench_corpus_{_VERSION}_{n_files}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    rng = random.Random(42)
    for i in range(n_files):
        n_channels = rng.choice([4, 6, 8, 10])
        n_records = rng.randrange(100, 300)
        text = _render_file(rng, n_channels, n_records)
        with open(os.path.join(out, f"bench_{i:05d}.ctd"), "w") as f:
            f.write(text)
    with open(marker, "w") as f:
        f.write(f"{n_files}\n")
    return out


if __name__ == "__main__":
    d = ensure_corpus()
    print(d, len([f for f in os.listdir(d) if f.endswith(".ctd")]))
