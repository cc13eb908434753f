#!/usr/bin/env python3
"""ABF -> Parquet converter: the out-of-engine ingest step (SURVEY §2.1).

Replicates the reference's loading contract (/root/reference/utils.py:5-22):
sweep 0 of channels 0..8 of an Axon Binary Format recording, emitted as the
engine's long SignalFrame table

    experiment_id: string   (defaults to the .abf file stem)
    channel:       int32    (0..8)
    sample_idx:    int64    (per-channel sample ordinal)
    t:             float64  (pyabf sweepX, seconds)
    y:             float64  (pyabf sweepY)

one Parquet file per recording, ready for `spark.read.parquet` and the
graft signal pipeline (q1..q10). The stimulus channel, when recorded as a
separate .abf, converts the same way via --suffix to keep the two tables
apart (signal.parquet / stim.parquet naming is up to the caller).

Requires pyabf + pandas + pyarrow. This build container has no network
egress and no pyabf wheel, so the script is shipped untested-in-container;
it follows the pyabf 2.x API exactly as the reference does.

Usage:
    python abf_to_parquet.py out_dir rec1.abf [rec2.abf ...]
    python abf_to_parquet.py --experiment-id expA --suffix _stim out_dir stim.abf
"""

import argparse
import pathlib
import sys


def convert(abf_path: pathlib.Path, out_dir: pathlib.Path,
            experiment_id: str | None, suffix: str, n_channels: int) -> pathlib.Path:
    import pandas as pd
    import pyabf

    abf = pyabf.ABF(str(abf_path))
    exp = experiment_id or abf_path.stem
    frames = []
    # reference contract (utils.py:12-20): sweep 0, channels 0..8, the
    # sweepX/sweepY arrays become the (t, y) columns
    for channel in range(n_channels):
        abf.setSweep(0, channel=channel)
        n = len(abf.sweepX)
        frames.append(pd.DataFrame({
            "experiment_id": exp,
            "channel": pd.Series([channel] * n, dtype="int32"),
            "sample_idx": pd.RangeIndex(n).astype("int64"),
            "t": abf.sweepX.astype("float64"),
            "y": abf.sweepY.astype("float64"),
        }))
    out = out_dir / f"{exp}{suffix}.parquet"
    pd.concat(frames, ignore_index=True).to_parquet(out, index=False)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("out_dir", type=pathlib.Path)
    ap.add_argument("abf", nargs="+", type=pathlib.Path)
    ap.add_argument("--experiment-id", default=None,
                    help="override the experiment id (default: file stem)")
    ap.add_argument("--suffix", default="",
                    help="output name suffix, e.g. _stim for stimulus recordings")
    ap.add_argument("--channels", type=int, default=9,
                    help="channels to extract (reference uses 9: utils.py:13)")
    args = ap.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)
    for p in args.abf:
        out = convert(p, args.out_dir, args.experiment_id, args.suffix, args.channels)
        print(f"{p} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
