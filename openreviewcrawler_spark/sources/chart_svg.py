"""Chart sinks — the reference's matplotlib figures
(/root/reference/statistics_from_json.py:48-302) re-expressed as: aggregate
DataFrame (distributed, already covered A1-A8) -> tiny collected matrix ->
standalone SVG bytes written by this module.

matplotlib is unavailable in this environment, and at 100 TB it is the wrong
layer anyway: the reference builds its chart matrices in driver-side dict
loops over the whole corpus; here every number in a figure comes out of a
groupBy plan and only O(venues x labels) values ever reach the driver. The
SVG layout is deliberately minimal (rect/text/line primitives, no styling
dependencies); the *data* in each figure — values, normalization, sort
order, bin edges — follows the reference exactly and is what the tests pin.

Figure parity map (reference fn -> here):
  plot_label_heatmap        -> plot_label_heatmap        (count/sub matrix)
  plot_comment_type_heatmap -> plot_comment_type_heatmap (count/total-comments)
  plot_sub_venue            -> plot_sub_venue            (bar, argsort ascending)
  plot_comment_venue        -> plot_comment_venue        (quartile box standing
                               in for the violin + total bar; medians identical)
  plot_revision_venue       -> plot_revision_venue       (same)
  plot_comment_distribution -> plot_count_distribution   (unit-bin density,
                               outliers > cap dropped, same bins)
  plot_revision_distribution-> plot_count_distribution   (same fn, other col)
"""

from __future__ import annotations

import xml.sax.saxutils as sx

from pyspark.sql import DataFrame

from ..operators.stats import LABELS, NOTE_TYPES

_W, _H = 900, 560  # fixed canvas; layout scales into it
_ML, _MT, _MR, _MB = 150, 50, 20, 110  # margins: left labels / title / axis


def _esc(s: str) -> str:
    return sx.escape(str(s))


def _plasma(t: float) -> str:
    """Two-segment approximation of the reference's 'plasma' colormap
    (dark indigo -> magenta -> yellow); t in [0, 1]."""
    t = min(1.0, max(0.0, t))
    if t < 0.5:
        u = t / 0.5
        r, g, b = 13 + u * (204 - 13), 8 + u * (71 - 8), 135 + u * (120 - 135)
    else:
        u = (t - 0.5) / 0.5
        r, g, b = 204 + u * (240 - 204), 71 + u * (249 - 71), 120 + u * (33 - 120)
    return f"rgb({int(r)},{int(g)},{int(b)})"


def _doc(body: list[str], title: str) -> bytes:
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif" font-size="12">'
        f'<rect width="{_W}" height="{_H}" fill="white"/>'
        f'<text x="{_W / 2}" y="24" text-anchor="middle" font-size="16">'
        f"{_esc(title)}</text>"
    )
    return (head + "".join(body) + "</svg>").encode()


def svg_heatmap(
    row_labels: list[str], col_labels: list[str], matrix: list[list[float]],
    title: str,
) -> bytes:
    """Annotated heatmap — the reference's imshow + per-cell ' {:.1f} ' text
    (statistics_from_json.py:53-74)."""
    nr, nc = len(row_labels), len(col_labels)
    cw = (_W - _ML - _MR) / max(nc, 1)
    ch = (_H - _MT - _MB) / max(nr, 1)
    flat = [v for row in matrix for v in row]
    lo, hi = (min(flat), max(flat)) if flat else (0.0, 1.0)
    span = (hi - lo) or 1.0
    body = []
    for i, rl in enumerate(row_labels):
        y = _MT + i * ch
        body.append(
            f'<text x="{_ML - 6}" y="{y + ch / 2 + 4}" text-anchor="end">'
            f"{_esc(rl)}</text>"
        )
        for j in range(nc):
            v = matrix[i][j]
            x = _ML + j * cw
            body.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{cw:.1f}" height="{ch:.1f}"'
                f' fill="{_plasma((v - lo) / span)}"/>'
                f'<text x="{x + cw / 2:.1f}" y="{y + ch / 2 + 4:.1f}"'
                f' text-anchor="middle" fill="white"> {v:.1f} </text>'
            )
    for j, cl in enumerate(col_labels):
        x = _ML + j * cw + cw / 2
        body.append(
            f'<text x="{x:.1f}" y="{_H - _MB + 18}" text-anchor="middle" '
            f'transform="rotate(-45 {x:.1f} {_H - _MB + 18})">{_esc(cl)}</text>'
        )
    return _doc(body, title)


def svg_bar(
    labels: list[str], values: list[float], title: str, ylabel: str,
    annotate: bool = True,
) -> bytes:
    """Bar chart with the reference's above-bar value annotations
    (statistics_from_json.py:108-117 autolabel)."""
    n = len(labels)
    slot = (_W - _ML - _MR) / max(n, 1)
    bw = slot * 0.35 / 0.5  # reference width=0.35 of unit slot
    vmax = max(values) if values else 1.0
    scale = (_H - _MT - _MB) / (vmax or 1.0)
    body = [
        f'<text x="16" y="{_H / 2}" transform="rotate(-90 16 {_H / 2})" '
        f'text-anchor="middle">{_esc(ylabel)}</text>'
    ]
    for i, (lab, v) in enumerate(zip(labels, values)):
        x = _ML + i * slot + (slot - bw) / 2
        h = v * scale
        y = _H - _MB - h
        body.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" height="{h:.1f}"'
            f' fill="#3b6bb5"/>'
        )
        if annotate:
            body.append(
                f'<text x="{x + bw / 2:.1f}" y="{y - 4:.1f}" text-anchor="middle">'
                f"{v:g}</text>"
            )
        lx = _ML + i * slot + slot / 2
        body.append(
            f'<text x="{lx:.1f}" y="{_H - _MB + 18}" text-anchor="middle" '
            f'transform="rotate(-45 {lx:.1f} {_H - _MB + 18})">{_esc(lab)}</text>'
        )
    return _doc(body, title)


def svg_density_hist(
    bins: list[int], densities: list[float], title: str, xlabel: str,
) -> bytes:
    """Unit-bin density histogram (reference bins = arange(0, cap+2)-0.5,
    density=True: statistics_from_json.py:264-270)."""
    if not bins:
        return _doc([], title)
    span = max(bins) - min(bins) + 1
    bw = (_W - _ML - _MR) / span
    dmax = max(densities) or 1.0
    scale = (_H - _MT - _MB) / dmax
    body = [
        f'<text x="{_W / 2}" y="{_H - 20}" text-anchor="middle">{_esc(xlabel)}</text>',
        f'<text x="16" y="{_H / 2}" transform="rotate(-90 16 {_H / 2})" '
        f'text-anchor="middle">Density</text>',
    ]
    b0 = min(bins)
    for b, d in zip(bins, densities):
        x = _ML + (b - b0) * bw
        h = d * scale
        body.append(
            f'<rect x="{x:.1f}" y="{_H - _MB - h:.1f}" width="{bw:.1f}"'
            f' height="{h:.1f}" fill="#3b6bb5" stroke="white"/>'
            f'<text x="{x + bw / 2:.1f}" y="{_H - _MB + 14:.1f}"'
            f' text-anchor="middle">{b}</text>'
        )
    return _doc(body, title)


def svg_box_and_bar(
    labels: list[str],
    quartiles: list[tuple[float, float, float]],
    totals: list[float],
    title: str,
    ylabel: str,
) -> bytes:
    """Two-panel stand-in for the reference's violin+bar figure
    (statistics_from_json.py:159-216): top panel per-group (q1, median, q3)
    boxes with the median tick the violinplot shows, bottom panel the total
    bar with annotations. Medians/totals match the reference numerically;
    the violin *silhouette* is the one presentational element not
    reproduced (no KDE without numpy/scipy plotting here)."""
    n = len(labels)
    slot = (_W - _ML - _MR) / max(n, 1)
    panel_h = (_H - _MT - _MB) / 2 - 20
    q3max = max((q[2] for q in quartiles), default=1.0) or 1.0
    qs = panel_h / q3max
    body = [
        f'<text x="16" y="{_MT + panel_h / 2}" transform="rotate(-90 16 '
        f'{_MT + panel_h / 2})" text-anchor="middle">{_esc(ylabel)}</text>'
    ]
    y0 = _MT + panel_h
    for i, (q1, med, q3) in enumerate(quartiles):
        x = _ML + i * slot + slot * 0.3
        w = slot * 0.4
        body.append(
            f'<rect x="{x:.1f}" y="{y0 - q3 * qs:.1f}" width="{w:.1f}"'
            f' height="{max(q3 - q1, 0) * qs:.1f}" fill="#9db8dd"/>'
            f'<line x1="{x:.1f}" y1="{y0 - med * qs:.1f}" x2="{x + w:.1f}"'
            f' y2="{y0 - med * qs:.1f}" stroke="#203050" stroke-width="2"/>'
        )
    tmax = max(totals) if totals else 1.0
    ts = panel_h / (tmax or 1.0)
    yb = _H - _MB
    for i, (lab, t) in enumerate(zip(labels, totals)):
        x = _ML + i * slot + slot * 0.3
        w = slot * 0.4
        h = t * ts
        body.append(
            f'<rect x="{x:.1f}" y="{yb - h:.1f}" width="{w:.1f}" height="{h:.1f}"'
            f' fill="#3b6bb5"/>'
            f'<text x="{x + w / 2:.1f}" y="{yb - h - 4:.1f}" text-anchor="middle">'
            f"{t:g}</text>"
        )
        lx = _ML + i * slot + slot / 2
        body.append(
            f'<text x="{lx:.1f}" y="{yb + 18}" text-anchor="middle" '
            f'transform="rotate(-45 {lx:.1f} {yb + 18})">{_esc(lab)}</text>'
        )
    return _doc(body, title)


# ---------------------------------------------------------------------------
# reference-figure wrappers: rollup DataFrame -> SVG bytes
# ---------------------------------------------------------------------------


def _vy_rows(rollup: DataFrame) -> list:
    """Collect the per-venue-year rollup in the reference's iteration order
    (dict insertion = venue then year; deterministic sort here)."""
    return rollup.orderBy("venue", "year").collect()


def plot_label_heatmap(rollup: DataFrame) -> bytes:
    """matrix[vy][label] = label_count / sub (statistics_from_json.py:48-75)."""
    rows = _vy_rows(rollup)
    venues = [f"{r['venue']} {r['year']}" for r in rows]
    matrix = [[r[lab] / r["sub"] for lab in LABELS] for r in rows]
    return svg_heatmap(
        venues, list(LABELS), matrix,
        "Acceptance label distribution for each venue",
    )


def plot_comment_type_heatmap(rollup: DataFrame) -> bytes:
    """matrix[vy][type] = type_count / total_comments, 0-guarded
    (statistics_from_json.py:77-104)."""
    rows = _vy_rows(rollup)
    venues = [f"{r['venue']} {r['year']}" for r in rows]
    matrix = []
    for r in rows:
        tot = sum(r["comments_per_submission"])
        matrix.append([(r[t] / tot if tot else 0.0) for t in NOTE_TYPES])
    return svg_heatmap(
        venues, list(NOTE_TYPES), matrix,
        "Comment type distribution for each venue",
    )


def _argsort_asc(pairs: list[tuple[str, float]]) -> list[tuple[str, float]]:
    # reference: np.argsort(values) — ascending, stable
    return sorted(pairs, key=lambda p: p[1])


def plot_sub_venue(rollup: DataFrame, reduce_year: bool = True) -> bytes:
    """Submissions bar, ascending by count (statistics_from_json.py:119-157)."""
    rows = _vy_rows(rollup)
    if reduce_year:
        agg: dict[str, int] = {}
        for r in rows:
            agg[r["venue"]] = agg.get(r["venue"], 0) + r["sub"]
        pairs = list(agg.items())
    else:
        pairs = [(f"{r['venue']} {r['year']}", r["sub"]) for r in rows]
    pairs = _argsort_asc(pairs)
    return svg_bar(
        [p[0] for p in pairs], [p[1] for p in pairs],
        "Submissions for each venue", "Submissions",
    )


def _quartiles(xs: list[int]) -> tuple[float, float, float]:
    """numpy-style linear-interpolation quartiles (what violinplot medians
    use); driver-side on an already-aggregated per-venue list."""
    if not xs:
        return (0.0, 0.0, 0.0)
    s = sorted(xs)

    def q(p: float) -> float:
        k = p * (len(s) - 1)
        f = int(k)
        c = min(f + 1, len(s) - 1)
        return s[f] + (s[c] - s[f]) * (k - f)

    return (q(0.25), q(0.5), q(0.75))


def plot_comment_venue(rollup: DataFrame, reduce_year: bool = True) -> bytes:
    """Comment distribution + totals per venue, ascending by total
    (statistics_from_json.py:159-216)."""
    rows = _vy_rows(rollup)
    if reduce_year:
        agg: dict[str, list[int]] = {}
        for r in rows:
            agg.setdefault(r["venue"], []).extend(r["comments_per_submission"])
        items = list(agg.items())
    else:
        items = [
            (f"{r['venue']} {r['year']}", list(r["comments_per_submission"]))
            for r in rows
        ]
    items.sort(key=lambda p: sum(p[1]))
    return svg_box_and_bar(
        [k for k, _ in items],
        [_quartiles(v) for _, v in items],
        [sum(v) for _, v in items],
        "Comment distribution and total comments for each venue",
        "Comments per submission",
    )


def plot_revision_venue(rev_counts: DataFrame, reduce_year: bool = True) -> bytes:
    """Revision distribution per venue (statistics_from_json.py:218-259);
    input = operators.stats.revisions_per_submission output."""
    rows = rev_counts.orderBy("venue", "year", "rec_order").collect()
    agg: dict[str, list[int]] = {}
    for r in rows:
        key = r["venue"] if reduce_year else f"{r['venue']} {r['year']}"
        agg.setdefault(key, []).append(r["n_revisions"])
    items = sorted(agg.items(), key=lambda p: sum(p[1]))
    return svg_box_and_bar(
        [k for k, _ in items],
        [_quartiles(v) for _, v in items],
        [sum(v) for _, v in items],
        "Revision distribution for each venue",
        "Revisions per submission",
    )


def plot_count_distribution(hist: DataFrame, xlabel: str, title: str) -> bytes:
    """Density histogram from operators.stats.count_histogram output —
    serves both plot_comment_distribution and plot_revision_distribution
    (statistics_from_json.py:261-302; cap/bins applied in the PLAN, only
    <=cap+1 (bin, density) rows reach the driver)."""
    rows = hist.orderBy("bin").collect()
    return svg_density_hist(
        [r["bin"] for r in rows], [r["density"] for r in rows], title, xlabel
    )


def write_figures(figures: dict[str, bytes], out_dir: str) -> list[str]:
    """Write named SVGs (the reference's resources/*.svg layout)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name, data in figures.items():
        p = os.path.join(out_dir, name if name.endswith(".svg") else f"{name}.svg")
        with open(p, "wb") as f:
            f.write(data)
        paths.append(p)
    return paths
