#!/usr/bin/env python3
"""Detection-plot demo: one channel rendered from engine output (SURVEY §2.7).

The engine deliberately ends at data parity — it emits every column the
reference's four plotly views consume (smooth, baseline, ceiling, diastolic,
detected peaks, TTP/TTR markers) rather than owning rendering. This script
closes the loop: it reads a `graft.Verify` output directory and renders the
reference's main detection view (peak_detection.py:301-487: smooth trace,
envelope band, diastolic reference, peak + marker dots) as a standalone SVG.

No plotting library needed — the SVG is written directly, so the demo runs
in the dependency-free build container:

    sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vout \
        q1_smooth,q2_baseline,q3_ceiling,q4_diastolic,q7b_peaks,q8b_markers"
    python scripts/plot_demo.py /tmp/vout demo.svg --channel 0
"""

import argparse
import glob
import pathlib
import sys

import pandas as pd

W, H, PAD = 960, 420, 45


def read_q(vout: pathlib.Path, name: str) -> pd.DataFrame:
    files = glob.glob(str(vout / name / "*.parquet"))
    if not files:
        raise SystemExit(f"missing {name} under {vout} — run graft.Verify first")
    return pd.concat(pd.read_parquet(f) for f in files)


def polyline(xs, ys, sx, sy, color, width=1.2, dash=""):
    pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
    d = f' stroke-dasharray="{dash}"' if dash else ""
    return (f'<polyline fill="none" stroke="{color}" stroke-width="{width}"'
            f'{d} points="{pts}"/>')


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("verify_out", type=pathlib.Path)
    ap.add_argument("svg_out", type=pathlib.Path)
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--experiment")
    args = ap.parse_args()

    smooth = read_q(args.verify_out, "q1_smooth")
    exp = args.experiment or sorted(smooth.experiment_id.unique())[0]

    def chan(df):
        out = df[(df.experiment_id == exp) & (df.channel == args.channel)]
        return out.sort_values("sample_idx") if "sample_idx" in out else out

    sm = chan(smooth)
    if sm.empty:
        raise SystemExit(f"no data for experiment {exp} channel {args.channel}")
    base = chan(read_q(args.verify_out, "q2_baseline"))
    ceil = chan(read_q(args.verify_out, "q3_ceiling"))
    dia = chan(read_q(args.verify_out, "q4_diastolic"))
    peaks = chan(read_q(args.verify_out, "q7b_peaks"))
    markers = chan(read_q(args.verify_out, "q8b_markers"))

    ys = pd.concat([sm.y_smooth, base.baseline.dropna(), ceil.ceiling.dropna()])
    x0, x1 = sm.sample_idx.min(), sm.sample_idx.max()
    y0, y1 = ys.min(), ys.max()
    yr = (y1 - y0) or 1.0

    def sx(x): return PAD + (x - x0) / (x1 - x0) * (W - 2 * PAD)
    def sy(y): return H - PAD - (y - y0) / yr * (H - 2 * PAD)

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
        f'viewBox="0 0 {W} {H}" font-family="sans-serif">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{PAD}" y="24" font-size="14">graft detection view — '
        f'experiment {exp}, channel {args.channel} '
        f'({len(peaks)} peaks)</text>',
        polyline(sm.sample_idx, sm.y_smooth, sx, sy, "#1f77b4"),
    ]
    for df, colname, color in ((base, "baseline", "#2ca02c"),
                               (ceil, "ceiling", "#d62728")):
        d = df.dropna(subset=[colname])
        if not d.empty:
            parts.append(polyline(d.sample_idx, d[colname], sx, sy, color, 1.0))
    d = dia.dropna(subset=["diastolic"])
    if not d.empty:
        parts.append(polyline(d.sample_idx, d.diastolic, sx, sy, "#9467bd",
                              1.0, dash="4 3"))
    for _, p in peaks.iterrows():
        parts.append(f'<circle cx="{sx(p.peak_idx):.1f}" cy="{sy(p.peak_value):.1f}" '
                     f'r="3.5" fill="#ff7f0e"/>')
    # TTP/TTR crossing markers: convert marker time back to sample index
    # (t = idx/rate on the fixture) using the peak rows' (idx, t) pairs
    if not peaks.empty and not markers.empty:
        rate = ((peaks.peak_idx / peaks.t).median()
                if (peaks.t > 0).any() else 100.0)
        for col_t, col_y, color in (("ttp_t", "ttp_y", "#17becf"),
                                    ("ttr_t", "ttr_y", "#8c564b")):
            d = markers.dropna(subset=[col_t, col_y])
            for _, r in d.iterrows():
                parts.append(f'<circle cx="{sx(r[col_t] * rate):.1f}" '
                             f'cy="{sy(r[col_y]):.1f}" r="2.5" fill="{color}"/>')
    legend = [("smooth", "#1f77b4"), ("baseline", "#2ca02c"),
              ("ceiling", "#d62728"), ("diastolic", "#9467bd"),
              ("peak", "#ff7f0e"), ("ttp", "#17becf"), ("ttr", "#8c564b")]
    for i, (name, color) in enumerate(legend):
        x = PAD + i * 110
        parts.append(f'<rect x="{x}" y="{H - 18}" width="10" height="10" fill="{color}"/>')
        parts.append(f'<text x="{x + 14}" y="{H - 9}" font-size="11">{name}</text>')
    parts.append("</svg>")
    args.svg_out.write_text("\n".join(parts))
    print(f"wrote {args.svg_out} ({len(peaks)} peaks, {len(sm)} samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
