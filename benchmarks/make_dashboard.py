"""Render a static HTML trend dashboard from benchmark JSONL history.

    python benchmarks/make_dashboard.py history.jsonl [more.jsonl ...] \
        -o dashboard/index.html

The nightly workflow (benchmarks.yml) appends each run's rows — tagged with
the run date — to a history file on the gh-pages branch and regenerates
this page, mirroring the reference's github-action-benchmark dashboard
(reference benchmarks.yml:29-39) without the external action: one SVG trend
panel per (model, batch) config, newest delta vs the previous run in the
panel subtitle, native hover tooltips per point.
"""

from __future__ import annotations

import argparse
import collections
import html
import json
import pathlib

SERIES = "#2a78d6"
ALERT = "#e34948"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e5e4e0"

W, H, PAD = 520, 180, 36


def load_rows(paths):
  rows = []
  for p in paths:
    for ln in pathlib.Path(p).read_text().splitlines():
      ln = ln.strip()
      if not ln:
        continue
      r = json.loads(ln)
      if "steps_per_sec" in r and r.get("steps_per_sec") and "model" in r:
        rows.append(r)
  return rows


def panel(key, pts):
  """One SVG trend panel: pts = [(label, steps_per_sec, extra)] in order."""
  vals = [v for _, v, _ in pts]
  lo, hi = min(vals), max(vals)
  span = (hi - lo) or hi or 1.0
  lo, hi = lo - 0.08 * span, hi + 0.08 * span

  def x(i):
    return PAD + (W - 2 * PAD) * (i / max(len(pts) - 1, 1))

  def y(v):
    return H - PAD + (2 * PAD - H) * ((v - lo) / (hi - lo))

  path = " ".join(
      f"{'M' if i == 0 else 'L'}{x(i):.1f},{y(v):.1f}"
      for i, (_, v, _) in enumerate(pts)
  )
  dots = []
  for i, (label, v, extra) in enumerate(pts):
    regressed = i > 0 and v < 0.7 * pts[i - 1][1]  # the CI alert threshold
    dots.append(
        f'<circle cx="{x(i):.1f}" cy="{y(v):.1f}" r="4" '
        f'fill="{ALERT if regressed else SERIES}" stroke="{SURFACE}" '
        f'stroke-width="2"><title>{html.escape(label)}: {v:,.0f} steps/s'
        f'{html.escape(extra)}</title></circle>'
    )
  delta = ""
  if len(pts) >= 2 and pts[-2][1]:
    pct = 100.0 * (pts[-1][1] / pts[-2][1] - 1.0)
    delta = f" · latest {pct:+.1f}% vs previous"
  gridlines = "".join(
      f'<line x1="{PAD}" x2="{W - PAD}" y1="{y(lo + f * (hi - lo)):.1f}" '
      f'y2="{y(lo + f * (hi - lo)):.1f}" stroke="{GRID}"/>'
      for f in (0.25, 0.5, 0.75)
  )
  return f"""
  <div class="panel">
    <h3>{html.escape(key)}</h3>
    <p class="sub">{pts[-1][1]:,.0f} steps/s{html.escape(delta)}</p>
    <svg viewBox="0 0 {W} {H}" width="{W}" height="{H}" role="img">
      {gridlines}
      <path d="{path}" fill="none" stroke="{SERIES}" stroke-width="2"
            stroke-linecap="round"/>
      {"".join(dots)}
    </svg>
  </div>"""


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("paths", nargs="+")
  ap.add_argument("-o", "--out", default="dashboard/index.html")
  args = ap.parse_args()

  groups = collections.defaultdict(list)
  for r in load_rows(args.paths):
    key = f"{r['model']} @ B={r.get('batch', '?')}"
    label = str(r.get("date") or r.get("round") or len(groups[key]) + 1)
    extra = ""
    if "pct_peak_flops" in r:
      extra = f" · {r['pct_peak_flops']}% of peak FLOPs"
    groups[key].append((label, float(r["steps_per_sec"]), extra))

  panels = "".join(panel(k, v) for k, v in sorted(groups.items()) if v)
  out = pathlib.Path(args.out)
  out.parent.mkdir(parents=True, exist_ok=True)
  out.write_text(f"""<!doctype html>
<html><head><meta charset="utf-8"><title>mjtpu benchmark trends</title>
<style>
  body {{ background: {SURFACE}; color: {TEXT};
         font: 14px system-ui, sans-serif; margin: 2rem; }}
  h1 {{ font-size: 1.3rem; }} h3 {{ margin: 0; font-size: 1rem; }}
  .sub {{ color: {TEXT_2}; margin: 0.15rem 0 0.4rem; font-size: 0.85rem; }}
  .panel {{ display: inline-block; margin: 0 1.5rem 1.5rem 0; }}
</style></head><body>
<h1>mjtpu benchmark trends</h1>
<p class="sub">env-steps/s per (model, batch) config; red point = over 30%
regression vs previous run (the CI gate threshold). Hover points for
values.</p>
{panels}
</body></html>
""")
  print(f"wrote {out} ({len(groups)} panels)")


if __name__ == "__main__":
  main()
